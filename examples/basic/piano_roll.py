"""
Piano-roll MIDI visualizer — graded config #5 (BASELINE.md: "MIDI + audio
spectrogram -> 4K60 export, full A/V mux").

Falling-notes piano visualizer in the style the reference's piano module
feeds (the author's Pianola project): the bottom band is a keyboard lit by
the smoothed key-press velocities, above it notes fall through the
roll-time window, colored per MIDI channel; a subtle audio-spectrogram glow
backs the scene. All data arrives through the ShaderPiano textures
(iPianoRoll / iPianoKeys / iPianoChan) and the audio modules.
"""

import sys
from pathlib import Path

import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent.parent))
import assets

from shaderflow_tpu import ops
from shaderflow_tpu.ops import clamp, mix, smoothstep, vec2, vec4
from shaderflow_tpu.scene import ShaderScene

CHANNEL_COLORS = [
    (0.95, 0.45, 0.25), (0.30, 0.70, 0.95), (0.55, 0.90, 0.45),
    (0.90, 0.80, 0.30), (0.80, 0.40, 0.90), (0.40, 0.90, 0.80),
]


def piano_roll_frag(sf):
    """TPU formulation: every lookup depends on the COLUMN only (the key
    under x) and every time term on the ROW only, so all texture reads are
    1D line gathers (thousands, not millions) and the 2D image is pure
    broadcast combination."""
    MAX_SLOTS = 8  # simultaneous notes per key checked per pixel

    dynamic = sf.iPianoDynamic                      # smoothed (min, max) note
    extra = sf.iPianoExtra
    lo = dynamic[0] - extra
    hi = dynamic[1] + extra
    span = hi - lo + 1.0

    ax = sf.astuv[0, :, 0]                          # (W,) column line
    ay = sf.astuv[:, 0, 1]                          # (H,) row line
    key_f = lo + ax * span                          # (W,) fractional note
    key = jnp.floor(key_f).astype(jnp.int32)
    key_frac = key_f - key

    black = ops.is_black_key(key)                   # (W,)
    kb_height = sf.iPianoHeight

    keys_tex = sf.tex("iPianoKeys")
    chan_tex = sf.tex("iPianoChan")
    roll_tex = sf.tex("iPianoRoll")

    zero = jnp.zeros_like(key)
    velocity = sf.texel_fetch(keys_tex, jnp.stack([key, zero], axis=-1))[..., 0]
    channel = sf.texel_fetch(chan_tex, jnp.stack([key, zero], axis=-1))[..., 0]
    pressed = clamp(velocity / 128.0, 0.0, 1.0)     # (W,)

    palette = jnp.array(CHANNEL_COLORS, jnp.float32)
    chan_color = palette[jnp.clip(channel.astype(jnp.int32), 0, len(CHANNEL_COLORS) - 1)]

    # ---- keyboard band (per-column color, row-gated felt strip) ----
    white_color = jnp.where(black[..., None], 0.12, 0.92)        # (W, 3)
    border = smoothstep(0.0, 0.08, key_frac) * smoothstep(1.0, 0.92, key_frac)
    kb_line = white_color * border[..., None]
    kb_line = mix(kb_line, chan_color, pressed[..., None] * 0.85)  # (W, 3)
    felt = (smoothstep(kb_height - 0.012, kb_height - 0.008, ay)
            * smoothstep(kb_height, kb_height - 0.004, ay))        # (H,)
    kb_rgb = mix(kb_line[None, :, :], jnp.array([0.8, 0.1, 0.15]),
                 felt[:, None, None])                              # (H, W, 3)

    # ---- rolling notes: time varies by row, note data by column ----
    t_row = sf.iTime + (ay - kb_height) / (1.0 - kb_height) * sf.iPianoRollTime  # (H,)
    edge = (smoothstep(0.02, 0.12, key_frac)
            * smoothstep(0.98, 0.88, key_frac))                    # (W,)

    note_rgb = jnp.zeros((ay.shape[0], ax.shape[0], 3), jnp.float32)
    note_hit = jnp.zeros((ay.shape[0], ax.shape[0]), jnp.float32)
    for slot in range(MAX_SLOTS):
        data = sf.texel_fetch(roll_tex, jnp.stack(
            [jnp.full_like(key, slot), key], axis=-1))             # (W, 4)
        start, end = data[..., 0], data[..., 1]
        chan, vel = data[..., 2], data[..., 3]
        active = ((vel > 0)[None, :]
                  & (start[None, :] <= t_row[:, None])
                  & (t_row[:, None] <= end[None, :]))              # (H, W)
        head = smoothstep(0.0, 0.02 * sf.iPianoRollTime, t_row[:, None] - start[None, :])
        tail = smoothstep(0.0, 0.02 * sf.iPianoRollTime, end[None, :] - t_row[:, None])
        body = edge[None, :] * head * tail
        color = palette[jnp.clip(chan.astype(jnp.int32), 0, len(CHANNEL_COLORS) - 1)]
        brightness = (0.55 + 0.45 * clamp(vel / 128.0, 0.0, 1.0))  # (W,)
        contrib = jnp.where(active, body * brightness[None, :], 0.0)
        note_rgb = note_rgb + color[None, :, :] * contrib[..., None]
        note_hit = jnp.maximum(note_hit, jnp.where(active, body, 0.0))

    # ---- background: dark gradient + spectrogram glow (1D lines) ----
    from shaderflow_tpu.ops.sampling import sample_separable
    spec = sample_separable(sf.tex("iSpectrogram"), jnp.full((1,), 0.5), ax)  # (W, 1, C)
    glow = jnp.sqrt(jnp.maximum(spec[:, 0, 0] + spec[:, 0, 1], 0.0) / 1000.0)  # (W,)
    bg = (jnp.array([0.02, 0.03, 0.05])[None, None]
          + jnp.array([0.05, 0.07, 0.12]) * (1.0 - ay)[:, None, None]
          + jnp.array([0.10, 0.05, 0.20])
          * (glow[None, :] * (1 - ay)[:, None] * 0.5)[..., None])
    # octave guides
    is_c = (jnp.mod(key, 12) == 0) & (key_frac < 0.06)             # (W,)
    bg = jnp.where(is_c[None, :, None], bg + 0.03, bg)

    roll_rgb = bg + note_rgb
    roll_rgb = jnp.where(note_hit[..., None] > 0, note_rgb + bg * 0.3, roll_rgb)

    in_keyboard = (ay < kb_height)[:, None, None]                  # (H, 1, 1)
    rgb = jnp.where(in_keyboard, kb_rgb, roll_rgb)
    return vec4(clamp(rgb, 0.0, 1.0), 1.0)


class PianoRoll(ShaderScene):
    """Falling-notes MIDI piano visualizer with audio spectrogram glow"""
    midi_file = None
    audio_file = None

    def build(self):
        from shaderflow_tpu.audio import ShaderAudio
        from shaderflow_tpu.audio.spectrogram import ShaderSpectrogram
        from shaderflow_tpu.piano import PianoNote, ShaderPiano

        self.piano = ShaderPiano(scene=self)
        self.piano.load_midi(self.midi_file or assets.midi_file())
        self.audio = ShaderAudio(scene=self, name="iAudio",
                                 file=self.audio_file or assets.music_wav())
        self.spectrogram = ShaderSpectrogram(scene=self, length=0, audio=self.audio,
                                             smooth=True)
        self.spectrogram.from_notes(
            start=PianoNote.from_frequency(20.0),
            end=PianoNote.from_frequency(10000.0),
            piano=True,
        )
        self.shader.fragment = piano_roll_frag


SCENES = [PianoRoll]

if __name__ == "__main__":
    from shaderflow_tpu.cli import launch
    launch(SCENES)
