"""Realtime capture/playback against a REAL audio backend (VERDICT r2 #8,
r3 #3).

Every other realtime-audio test runs against fake recorder objects
(test_realtime_audio.py); this one exercises the genuine path the way the
reference records from a live PulseAudio daemon through `soundcard`
(/root/reference/shaderflow/audio/module.py:29-54,98-99,354-379).

Backend resolution mirrors production (BrokenAudio._backend): `soundcard`
against a sound server when both exist, else the in-repo SDL backend
(shaderflow_tpu/audio/sdlaudio.py) — pygame's bundled SDL2, which reaches
PulseAudio/pipewire on desktops and falls back to SDL's dummy driver on
headless CI, where the capture loop STILL runs for real (an SDL audio
thread delivering correctly-paced blocks). This test therefore always runs
here — it FAILS, not skips, if no backend can open a device.
"""

import os
import shutil
import subprocess
import sys
import time

import numpy as np


def _try_bootstrap_pulseaudio() -> None:
    """Best-effort: when the soundcard package exists but no server is up,
    start a headless PulseAudio with a null sink (the reference's Docker
    recipe, audio/module.py:29-54). No-op without the binary."""
    try:
        import soundcard
        if len(soundcard.all_speakers()) > 0:
            return
    except Exception:
        return
    binary = shutil.which("pulseaudio")
    if binary is None:
        return
    subprocess.run([binary, "--start", "--exit-idle-time=60"],
                   capture_output=True, timeout=30)
    subprocess.run(["pactl", "load-module", "module-null-sink",
                    "sink_name=shaderflow_test"],
                   capture_output=True, timeout=10)
    for _ in range(20):
        try:
            import soundcard
            if len(soundcard.all_speakers()) > 0:
                return
        except Exception:
            pass
        time.sleep(0.25)


def test_real_capture_and_playback_cycle():
    _try_bootstrap_pulseaudio()

    from shaderflow_tpu.audio import AudioMode, BrokenAudio

    backend = BrokenAudio._backend()
    assert backend is not None, (
        "no realtime audio backend opened: neither 'soundcard'+server nor "
        "pygame/SDL — the realtime capture path has no execution evidence")

    audio = BrokenAudio()
    audio.open_recorder(samplerate=44100, blocksize=512)
    assert audio.recorder is not None, "recorder did not open against the backend"
    assert audio.mode == AudioMode.Realtime

    # One real capture cycle: samples must land in the rolling buffer,
    # delivered by the backend's own audio thread at device pace.
    data = audio.record(numframes=1024)
    assert data is not None
    assert data.shape[0] == audio.channels
    assert data.shape[1] >= 1024

    # A second cycle: the stream keeps producing (not a one-shot fluke)
    tell_before = audio.tell
    audio.record(numframes=512)
    assert audio.tell >= tell_before + 512

    # One real playback cycle through the default sink: play() streams
    # (returns once the device buffered the chunk); draining afterwards
    # proves the device actually consumed the samples at its own pace.
    audio.open_speaker()
    assert audio.speaker is not None, "speaker did not open against the backend"
    tone = np.sin(np.linspace(0, 2 * np.pi * 440, 4410, dtype=np.float32))
    audio.play(np.stack([tone] * audio.channels))
    audio.play(np.stack([tone] * audio.channels))  # second chunk queues gaplessly
    if hasattr(audio.speaker, "drain"):
        audio.speaker.drain()

    audio.close_recorder()
    audio.close_speaker()


def test_recorder_device_listing_nonempty():
    """Device enumeration works through whichever backend is active."""
    from shaderflow_tpu.audio import BrokenAudio
    devices = list(BrokenAudio.recorders()) + list(BrokenAudio.speakers())
    assert devices, "no audio devices enumerable through any backend"
    assert all(hasattr(d, "name") for d in devices)


_DISK_PLAYER = r"""
import os, sys
import numpy as np
from shaderflow_tpu.audio.sdlaudio import default_speaker
import pygame

sp = default_speaker()
with sp.player(samplerate=44100, channels=1) as player:
    t = np.arange(22050, dtype=np.float32) / 44100.0
    player.play(0.8 * np.sin(2 * np.pi * 1000.0 * t))
    player.drain()
rate, size, channels = pygame.mixer.get_init()
pygame.mixer.quit()   # closes the disk device -> flushes the file
print(f"MIXER {rate} {size} {channels}")
"""


def test_playback_content_via_disk_driver(tmp_path):
    """The played STREAM carries the right audio (loopback-of-what's-playing,
    VERDICT r4 #9 / ROADMAP backlog #4).

    This environment has no sound server to loop through — no pulseaudio/
    pipewire binaries, no libpulse/libasound in the image (probed 2026-08-19)
    and installs are prohibited — so the dummy driver keeps pacing honest but
    discards content. SDL's `disk` driver closes that last gap: the mixer's
    real output stream is written to a file, i.e. a capture of exactly what
    the device played. Assert the 1 kHz tone round-trips spectrally."""
    capture = tmp_path / "played.raw"
    env = dict(os.environ,
               SHADERFLOW_SDL_AUDIODRIVER="disk",
               SDL_DISKAUDIOFILE=str(capture),
               SDL_DISKAUDIODELAY="1")
    proc = subprocess.run([sys.executable, "-c", _DISK_PLAYER], env=env,
                          capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = next(l for l in proc.stdout.splitlines() if l.startswith("MIXER"))
    rate, size, channels = map(int, line.split()[1:])

    blob = np.fromfile(capture, dtype=np.int16 if abs(size) == 16
                       else np.float32)
    assert blob.size > 0, "disk driver wrote no audio"
    mono = blob.reshape(-1, channels).mean(axis=1).astype(np.float64)
    if abs(size) == 16:
        mono /= 32767.0
    # The stream includes leading/trailing device silence; the tone must
    # still dominate the spectrum at 1 kHz
    spectrum = np.abs(np.fft.rfft(mono))
    freqs = np.fft.rfftfreq(mono.size, 1.0 / rate)
    peak = freqs[int(np.argmax(spectrum))]
    assert abs(peak - 1000.0) < 25.0, f"peak at {peak:.1f} Hz, wanted 1 kHz"
    # And with real energy (not numerical dust off silence)
    assert float(np.sqrt(np.mean(mono ** 2))) > 0.05
