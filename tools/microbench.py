"""Raw device calibration: what does one frame's worth of work actually cost
on this chip? Times elementwise, pooling, scan overhead, carry traffic, and
host<->device transfers to locate the flat-shader floor."""
import os, sys, time
import jax, jax.numpy as jnp, numpy as np

N = 50
H, W, C = 2160, 3840, 4

def timeit(name, fn, *args, n=N):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else jax.block_until_ready(fn(*args))
    t0 = time.monotonic()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    per = (time.monotonic() - t0) / n
    print(f"{name:<42} {per*1000:9.3f} ms", flush=True)
    return per

x = jnp.ones((H, W, C), jnp.float32)
small = jnp.ones((1080, 1920, C), jnp.float32)

timeit("elementwise x*2+1 (2160x3840x4)", jax.jit(lambda a: a * 2 + 1), x)
timeit("20-op elementwise chain", jax.jit(lambda a: sum(jnp.sin(a * k) for k in range(1, 21))), x)
timeit("avgpool 2x + u8", jax.jit(lambda a: jnp.floor(jnp.clip(a.reshape(1080, 2, 1920, 2, C).mean((1, 3)), 0, 1) * 255 + .5).astype(jnp.uint8)), x)

def scan_flat(carry, xs):
    def body(c, t):
        out = jnp.full((H, W, C), t)
        c = c.at[0, 0].set(out)
        c = jnp.roll(c, 1, axis=0)
        frame = jnp.floor(jnp.clip(c[0, 0].reshape(1080, 2, 1920, 2, C).mean((1, 3))[..., :3], 0, 1) * 255 + .5).astype(jnp.uint8)
        return c, frame
    return jax.lax.scan(body, carry, xs)

carry = jnp.zeros((1, 1, H, W, C), jnp.float32)
ts = jnp.linspace(0, 1, 32)
f = jax.jit(scan_flat)
jax.block_until_ready(f(carry, ts))
t0 = time.monotonic()
for _ in range(5):
    out = f(carry, ts)
jax.block_until_ready(out)
print(f"{'scan32: set+roll+pool+u8 per frame':<42} {(time.monotonic()-t0)/5/32*1000:9.3f} ms", flush=True)

# Without the roll
def scan_noroll(carry, xs):
    def body(c, t):
        out = jnp.full((H, W, C), t)
        c = c.at[0, 0].set(out)
        frame = jnp.floor(jnp.clip(c[0, 0].reshape(1080, 2, 1920, 2, C).mean((1, 3))[..., :3], 0, 1) * 255 + .5).astype(jnp.uint8)
        return c, frame
    return jax.lax.scan(body, carry, xs)
f2 = jax.jit(scan_noroll)
jax.block_until_ready(f2(carry, ts))
t0 = time.monotonic()
for _ in range(5):
    out = f2(carry, ts)
jax.block_until_ready(out)
print(f"{'scan32: set+pool+u8 (no roll) per frame':<42} {(time.monotonic()-t0)/5/32*1000:9.3f} ms", flush=True)

# No carry at all: pure map
def scan_nocarry(xs):
    def body(c, t):
        out = jnp.full((H, W, C), t)
        frame = jnp.floor(jnp.clip(out.reshape(1080, 2, 1920, 2, C).mean((1, 3))[..., :3], 0, 1) * 255 + .5).astype(jnp.uint8)
        return c, frame
    return jax.lax.scan(body, 0.0, xs)
f3 = jax.jit(scan_nocarry)
jax.block_until_ready(f3(ts))
t0 = time.monotonic()
for _ in range(5):
    out = f3(ts)
jax.block_until_ready(out)
print(f"{'scan32: no-carry pool+u8 per frame':<42} {(time.monotonic()-t0)/5/32*1000:9.3f} ms", flush=True)

# interp matmuls for separable sampling at this size
wv = jnp.ones((H, 1080), jnp.float32) / 1080
wu = jnp.ones((W, 1920), jnp.float32) / 1920
def sep(tex):
    rows = jnp.einsum("oh,hwc->owc", wv, tex, preferred_element_type=jnp.float32)
    return jnp.einsum("pw,owc->opc", wu, rows, preferred_element_type=jnp.float32)
timeit("separable interp matmuls 1080p->4k", jax.jit(sep), small, n=20)

# shift-add conv 11x11 on texture
def conv(tex):
    p = jnp.pad(tex, ((5,5),(5,5),(0,0)))
    out = jnp.zeros_like(tex)
    for dy in range(11):
        for dx in range(11):
            out = out + p[dy:dy+1080, dx:dx+1920] * (0.01*dy+dx*0.001)
    return out
timeit("shift-add 11x11 conv on 1080p tex", jax.jit(conv), small, n=20)

# transfers
frame_u8 = jnp.zeros((32, 1080, 1920, 3), jnp.uint8)
jax.block_until_ready(frame_u8)
t0 = time.monotonic(); _ = np.asarray(frame_u8); dt = time.monotonic()-t0
print(f"{'device->host 32x6.2MB u8':<42} {dt*1000:9.3f} ms  ({frame_u8.nbytes/dt/1e9:.2f} GB/s)", flush=True)
host = np.zeros((8, 1080, 1920, 3), np.uint8)
t0 = time.monotonic(); jax.block_until_ready(jnp.asarray(host)); dt = time.monotonic()-t0
print(f"{'host->device 8x6.2MB':<42} {dt*1000:9.3f} ms", flush=True)
t0 = time.monotonic()
for _ in range(20):
    jax.block_until_ready(jnp.asarray(np.float32(1.0)) + 1)
print(f"{'scalar roundtrip dispatch':<42} {(time.monotonic()-t0)/20*1000:9.3f} ms", flush=True)
