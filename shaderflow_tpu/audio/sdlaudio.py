"""
SDL audio backend: realtime capture/playback without the `soundcard` package.

The reference's realtime mode records from PulseAudio through `soundcard`
(/root/reference/shaderflow/audio/module.py:29-54,98-99,354-379). That
package is an optional extra; when it is absent this module provides the
same four-call API surface (`all_microphones`, `all_speakers`,
`default_microphone`, `default_speaker`, device `.recorder()`/`.player()`
context managers) over SDL2's audio subsystem, which ships inside the
always-present pygame wheel together with its own libpulse — so on a
desktop the samples still flow through PulseAudio/pipewire, and on a
server with no sound daemon SDL's `dummy` driver delivers real timed
silence (a genuine capture loop with real callbacks and real pacing, not
a mock).

Blocking semantics mirror soundcard's: `record(n)` waits for n frames from
the driver callback; `record(None)` returns everything buffered (at least
one block); `play(data)` queues and waits until the device consumed it.
"""

from __future__ import annotations

import os
import threading
import time
from typing import Optional

import numpy as np

from shaderflow_tpu import logger

AUDIO_F32LSB = 0x8120  # SDL_AudioFormat: 32-bit float, little-endian


def _init_sdl_audio():
    """Initialize SDL's audio subsystem, falling back to the dummy driver
    when no sound server is reachable. Returns the pygame._sdl2.audio
    module, or raises ImportError/RuntimeError."""
    import pygame
    import pygame._sdl2.audio as sdl2_audio

    if pygame.get_init() and pygame.mixer.get_init():
        return sdl2_audio
    driver = os.environ.get("SHADERFLOW_SDL_AUDIODRIVER")
    if driver:
        os.environ["SDL_AUDIODRIVER"] = driver
    try:
        pygame.mixer.init()
    except Exception:
        # No reachable sound server: the dummy driver still runs a real
        # SDL audio thread with correctly-paced callbacks (silence in,
        # sink out) — enough for the capture/playback cycle to be real.
        # Restore the env afterwards: pinning SDL_AUDIODRIVER=dummy would
        # force silence on every later re-init (and on child processes)
        # even once a sound server comes up.
        previous = os.environ.get("SDL_AUDIODRIVER")
        os.environ["SDL_AUDIODRIVER"] = "dummy"
        try:
            pygame.mixer.init()
            logger.warn("No sound server reachable; SDL audio running on "
                        "the dummy driver (silence in/out) for this init")
        finally:
            if previous is None:
                os.environ.pop("SDL_AUDIODRIVER", None)
            else:
                os.environ["SDL_AUDIODRIVER"] = previous
    return sdl2_audio


class _SDLRecorder:
    """Capture stream: SDL callback thread appends blocks, record() drains.

    Mirrors soundcard's `_Recorder` surface used by BrokenAudio:
    context-manager protocol, `.record(numframes)` -> (frames, channels)
    float32 in [-1, 1], `._samplerate`."""

    def __init__(self, devicename: Optional[str], samplerate: int,
                 channels: int, blocksize: int):
        sdl2_audio = _init_sdl_audio()
        self._chunks: list[np.ndarray] = []
        self._cond = threading.Condition()
        self._closed = False

        def callback(device, memoryview_bytes):
            block = np.frombuffer(bytes(memoryview_bytes), np.float32)
            with self._cond:
                self._chunks.append(block)
                self._cond.notify_all()

        if devicename is None:  # pygame requires a concrete name string
            names = _device_names(True)
            if not names:
                raise RuntimeError("SDL exposes no audio capture devices")
            devicename = names[0]
        # allowed_changes=0: SDL converts whatever the driver delivers to
        # exactly the requested f32/rate/channels — record() never needs
        # format fixups.
        self._device = sdl2_audio.AudioDevice(
            devicename=devicename, iscapture=True,
            frequency=int(samplerate), audioformat=AUDIO_F32LSB,
            numchannels=int(channels), chunksize=int(blocksize),
            allowed_changes=0, callback=callback)
        self._samplerate = float(self._device.frequency)
        self.channels = int(self._device.numchannels)
        self._device.pause(0)

    def __enter__(self) -> "_SDLRecorder":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def _buffered_frames(self) -> int:
        return sum(len(c) for c in self._chunks) // self.channels

    def record(self, numframes: Optional[int] = None) -> np.ndarray:
        """Blocks until `numframes` frames arrived (or, for None, until at
        least one driver block did); returns (frames, channels) float32."""
        deadline = time.monotonic() + 10.0
        with self._cond:
            while not self._closed:
                have = self._buffered_frames()
                if (have >= numframes) if numframes else (have > 0):
                    break
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    raise TimeoutError(
                        "SDL capture produced no data for 10 s (device "
                        "stalled or paused)")
                self._cond.wait(timeout=remaining)
            flat = np.concatenate(self._chunks) if self._chunks else (
                np.zeros(0, np.float32))
            want = (numframes or self._buffered_frames()) * self.channels
            taken, rest = flat[:want], flat[want:]
            self._chunks = [rest] if len(rest) else []
        return taken.reshape(-1, self.channels)

    def close(self) -> None:
        with self._cond:
            self._closed = True
            self._cond.notify_all()
        self._device.pause(1)
        self._device.close()


class _SDLPlayer:
    """Playback stream through pygame.mixer (which owns SDL's playback
    device — opening a second AudioDevice on it raises "already open").

    Streaming semantics match soundcard's player: play() converts the chunk
    to the mixer's format and hands it to ONE dedicated channel, using the
    channel's gapless queue slot as the stream buffer. It returns
    immediately while the device has room (current + one queued chunk) and
    blocks only on backpressure — a realtime producer pacing chunks at the
    frame rate therefore never waits (the old wait-until-consumed form cost
    a full chunk duration per frame, serializing the preview loop)."""

    def __init__(self, devicename: Optional[str], samplerate: int,
                 channels: int, blocksize: int = 512):
        import pygame
        _init_sdl_audio()
        self._pygame = pygame
        init = pygame.mixer.get_init()
        # The mixer owns ONE output device (whatever it was initialized
        # with); a specific devicename cannot be honored on this backend —
        # say so instead of silently playing elsewhere.
        if devicename is not None:
            default = (_device_names(False) or [None])[0]
            if devicename != default:
                logger.warn(f"SDL playback backend uses the mixer's device; "
                            f"requested {devicename!r} is ignored "
                            "(install 'soundcard' for per-device playback)")
        # The mixer owns the device at ITS format; the caller's samplerate
        # is remembered and chunks are linearly resampled onto the mixer's
        # rate in play() (48 kHz file audio must not play 8.8% slow).
        self._samplerate = float(samplerate)
        self._mixer_rate = float(init[0]) if init else 44100.0
        self._mixer_channels = int(init[2]) if init else int(channels)
        self._mixer_size = init[1] if init else -16
        self.channels = int(channels)
        self._channel = pygame.mixer.Channel(0)

    def __enter__(self) -> "_SDLPlayer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def play(self, data: np.ndarray) -> None:
        pygame = self._pygame
        data = np.asarray(data, np.float32)
        if data.ndim == 1:
            data = data[:, None]
        # Match the mixer's channel count (repeat mono / downmix extras)
        if data.shape[1] < self._mixer_channels:
            data = np.repeat(data[:, :1], self._mixer_channels, axis=1)
        elif data.shape[1] > self._mixer_channels:
            data = data[:, :self._mixer_channels]
        # Resample onto the mixer's rate (linear; monitoring path)
        if abs(self._samplerate - self._mixer_rate) > 0.5 and len(data) > 1:
            n_out = max(1, int(round(len(data) * self._mixer_rate
                                     / self._samplerate)))
            src = np.arange(len(data), dtype=np.float64)
            dst = np.linspace(0.0, len(data) - 1.0, n_out)
            data = np.stack([np.interp(dst, src, data[:, c])
                             for c in range(data.shape[1])], axis=1)
        if self._mixer_size in (-16, 16):
            pcm = np.clip(data, -1.0, 1.0)
            pcm = (pcm * 32767.0).astype(np.int16)
        else:
            pcm = np.ascontiguousarray(data, np.float32)
        sound = pygame.mixer.Sound(buffer=np.ascontiguousarray(pcm).tobytes())
        deadline = time.monotonic() + 10.0 + len(data) / (self._mixer_rate or 44100.0)
        while True:
            if not self._channel.get_busy():
                self._channel.play(sound)
                return
            if self._channel.get_queue() is None:
                self._channel.queue(sound)   # gapless hand-off
                return
            if time.monotonic() > deadline:
                raise TimeoutError("SDL playback stalled for 10 s")
            time.sleep(0.002)

    def drain(self, timeout: float = 10.0) -> None:
        """Block until the device consumed everything queued (tests and
        clean shutdowns; NOT on the streaming path)."""
        deadline = time.monotonic() + timeout
        while self._channel.get_busy():
            if time.monotonic() > deadline:
                raise TimeoutError("SDL playback stalled while draining")
            time.sleep(0.005)

    def close(self) -> None:
        # Stop OUR channel only — mixer.stop() would kill every channel
        # process-wide (other pygame audio users included)
        try:
            self._channel.stop()
        except Exception:
            pass


class SDLDevice:
    """One enumerable device — quacks like a soundcard microphone/speaker:
    `.name`, `.channels`, `.isloopback`, `.recorder()` / `.player()`."""

    def __init__(self, name: str, iscapture: bool):
        self.name = name
        self.iscapture = iscapture
        self.isloopback = "monitor" in name.lower()  # PulseAudio convention
        self.channels = 2

    def __repr__(self) -> str:
        kind = "microphone" if self.iscapture else "speaker"
        return f"<SDL {kind} {self.name!r}>"

    def recorder(self, samplerate: int = 44100, channels=None,
                 blocksize: int = 512) -> _SDLRecorder:
        return _SDLRecorder(self.name, samplerate,
                            int(channels or self.channels), blocksize)

    def player(self, samplerate: int = 44100, channels=None,
               blocksize: int = 512) -> _SDLPlayer:
        return _SDLPlayer(self.name, samplerate,
                          int(channels or self.channels), blocksize)


def _device_names(iscapture: bool) -> list[str]:
    """Real SDL device names only — pygame's AudioDevice requires a concrete
    name string (no default-device sentinel), so a fabricated placeholder
    would just bounce off SDL with 'No such device' later."""
    sdl2_audio = _init_sdl_audio()
    try:
        return sdl2_audio.get_audio_device_names(iscapture)
    except Exception as error:
        logger.debug(f"SDL device enumeration failed: {error}")
        return []


def all_microphones(include_loopback: bool = False) -> list[SDLDevice]:
    devices = [SDLDevice(n, True) for n in _device_names(True)]
    if not include_loopback:
        devices = [d for d in devices if not d.isloopback]
    return devices


def all_speakers() -> list[SDLDevice]:
    return [SDLDevice(n, False) for n in _device_names(False)]


def _default_device(iscapture: bool) -> SDLDevice:
    names = _device_names(iscapture)
    if not names:
        raise RuntimeError(
            f"SDL exposes no audio {'capture' if iscapture else 'playback'} "
            "devices (driver cannot enumerate)")
    return SDLDevice(names[0], iscapture)


def default_microphone() -> SDLDevice:
    return _default_device(True)


def default_speaker() -> SDLDevice:
    return _default_device(False)
