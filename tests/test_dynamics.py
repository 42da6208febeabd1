"""Dynamics (second-order ODE smoother): convergence, critical damping, parity
between the host-side DynamicNumber and the batched lax.scan form."""

import numpy as np
import pytest

from shaderflow_tpu.ops.dynamics import Coefficients, DynamicNumber, scan, step


def test_converges_to_target():
    d = DynamicNumber(value=0.0, frequency=2.0, zeta=1.0)
    for _ in range(600):
        d.next(target=1.0, dt=1 / 60)
    assert float(d.value) == pytest.approx(1.0, abs=1e-4)


def test_critical_damping_no_overshoot():
    d = DynamicNumber(value=0.0, frequency=1.0, zeta=1.0)
    peak = 0.0
    for _ in range(600):
        peak = max(peak, float(d.next(target=1.0, dt=1 / 60)))
    assert peak <= 1.0 + 1e-3


def test_underdamped_overshoots():
    d = DynamicNumber(value=0.0, frequency=1.0, zeta=0.2)
    peak = 0.0
    for _ in range(600):
        peak = max(peak, float(d.next(target=1.0, dt=1 / 60)))
    assert peak > 1.2


def test_vectorized_state():
    d = DynamicNumber(value=np.zeros(4), frequency=3.0)
    d.next(target=np.array([1.0, 2.0, 3.0, 4.0]), dt=0.1)
    assert d.value.shape == (4,)


def test_integral_accumulates():
    d = DynamicNumber(value=1.0, frequency=2.0, integrate=True)
    for _ in range(60):
        d.next(target=1.0, dt=1 / 60)
    # Settled at 1.0 for 1 second -> integral ~ 1
    assert float(d.integral) == pytest.approx(1.0, abs=0.05)


def test_precision_early_out():
    d = DynamicNumber(value=5.0, frequency=2.0, precision=1e-6)
    v0 = d.next(target=5.0, dt=0.1)
    assert float(v0) == 5.0


def test_pole_matching_branch_stable():
    # High frequency * large dt triggers the pole-matching branch
    coeffs = Coefficients.compute(frequency=100.0, zeta=1.0, response=0.0, dt=0.1)
    assert np.isfinite(coeffs.k1) and np.isfinite(coeffs.k2)
    d = DynamicNumber(value=0.0, frequency=100.0, zeta=1.0)
    for _ in range(50):
        d.next(target=1.0, dt=0.1)
    assert float(d.value) == pytest.approx(1.0, abs=1e-3)


def test_scan_matches_host_stepper():
    dt = 1 / 60
    targets = np.sin(np.linspace(0, 6, 120)).astype(np.float32)
    values = np.asarray(scan(targets, 0.0, dt, frequency=4.0, zeta=0.7, response=0.1))

    d = DynamicNumber(value=0.0, frequency=4.0, zeta=0.7, response=0.1, precision=0.0,
                      dtype=np.float32)
    host = []
    for t in targets:
        host.append(float(d.next(target=float(t), dt=dt)))
    np.testing.assert_allclose(values, host, atol=1e-4)


def test_functional_step_matches_class():
    coeffs = Coefficients.compute(2.0, 1.0, 0.0, 1 / 60)
    v, dv, prev = 0.0, 0.0, 0.0
    d = DynamicNumber(value=0.0, frequency=2.0, zeta=1.0, precision=0.0)
    for i in range(30):
        target = float(np.sin(i / 5))
        v, dv, prev = step(v, dv, prev, target, 1 / 60, coeffs)
        d.next(target=target, dt=1 / 60)
    assert float(d.value) == pytest.approx(v, abs=1e-9)


def test_trajectory_matches_reference_transcription():
    """Full-trajectory oracle vs a literal transcription of the reference's
    DynamicNumber.next (dynamics.py:164-242): k1/k2/k3, the k2 stability
    clamp, the pole-matching fast branch (cos and cosh sides), velocity
    estimation and semi-implicit Euler order."""
    import math

    import numpy as np

    from shaderflow_tpu.ops import dynamics as dyn

    def reference_run(targets, dt, frequency, zeta, response):
        pi, tau = math.pi, math.tau
        radians = tau * frequency
        K1 = zeta / (pi * frequency)
        K2 = 1.0 / (radians * radians)
        K3 = (response * zeta) / (tau * frequency)
        value = np.zeros_like(targets[0])
        derivative = np.zeros_like(value)
        previous = np.zeros_like(value)
        out = []
        for target in targets:
            velocity = (target - previous) / dt
            previous = target.copy()
            if radians * dt < zeta:
                k1 = K1
                k2 = max(K1 * dt, K2, 0.5 * (K1 + dt) * dt)
            else:
                damping = radians * abs(zeta * zeta - 1.0) ** 0.5
                t1 = math.exp(-zeta * radians * dt)
                a1 = 2 * t1 * (math.cos if zeta <= 1 else math.cosh)(damping * dt)
                t2 = 1 / (1 + t1 * t1 - a1) * dt
                k1 = t2 * (1 - t1 * t1)
                k2 = t2 * dt
            value = value + derivative * dt
            acceleration = (target + K3 * velocity - value - k1 * derivative) / k2
            derivative = derivative + acceleration * dt
            out.append(value.copy())
        return np.stack(out)

    rng = np.random.default_rng(5)
    targets = rng.standard_normal((40, 3)).astype(np.float32).cumsum(0)
    # slow system (clamp branch), fast underdamped (cos), fast overdamped (cosh)
    for frequency, zeta, response in [(2.0, 1.0, 0.0), (40.0, 0.5, 2.0),
                                      (40.0, 1.8, -1.0)]:
        ours = np.asarray(dyn.scan(targets, np.zeros(3, np.float32), 1 / 60,
                                   frequency=frequency, zeta=zeta,
                                   response=response))
        ref = reference_run(targets.astype(np.float64), 1 / 60,
                            frequency, zeta, response)
        np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=1e-4,
                                   err_msg=f"f={frequency} z={zeta} r={response}")
