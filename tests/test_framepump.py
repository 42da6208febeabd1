"""C++ frame pump: build, ordered delivery, error propagation."""

import os

import numpy as np
import pytest

from shaderflow_tpu.io.framepump import FramePump, _load_library


def test_native_library_builds():
    lib = _load_library()
    assert lib is not None, "g++ build of framepump.cpp failed"


def _roundtrip(native: bool, payloads: list[bytes]) -> bytes:
    read_fd, write_fd = os.pipe()
    # Large pipe buffer so the writer never blocks on the reader in-test
    try:
        import fcntl
        fcntl.fcntl(write_fd, 1031, 1 << 20)  # F_SETPIPE_SZ
    except Exception:
        pass
    pump = FramePump(write_fd, slot_size=max(len(p) for p in payloads), slots=3,
                     native=native)
    for payload in payloads:
        pump.submit(np.frombuffer(payload, np.uint8))
    pump.close()
    os.close(write_fd)
    chunks = []
    while True:
        chunk = os.read(read_fd, 1 << 16)
        if not chunk:
            break
        chunks.append(chunk)
    os.close(read_fd)
    return b"".join(chunks)


@pytest.mark.parametrize("native", [True, False], ids=["native", "python"])
def test_ordered_delivery(native):
    payloads = [bytes([i]) * 1000 for i in range(20)]
    received = _roundtrip(native, payloads)
    assert received == b"".join(payloads)
    if native:
        # Confirm we actually exercised the C++ path
        pump = FramePump(os.open(os.devnull, os.O_WRONLY), 10, 2, native=True)
        assert pump.is_native
        pump.close()


@pytest.mark.parametrize("native", [True, False], ids=["native", "python"])
def test_broken_pipe_raises(native):
    read_fd, write_fd = os.pipe()
    os.close(read_fd)
    import signal
    previous = signal.signal(signal.SIGPIPE, signal.SIG_IGN)
    try:
        pump = FramePump(write_fd, slot_size=1 << 20, slots=2, native=native)
        with pytest.raises(BrokenPipeError):
            for _ in range(64):
                pump.submit(b"x" * (1 << 20))
            pump.flush()
    finally:
        signal.signal(signal.SIGPIPE, previous)
        os.close(write_fd)


def test_large_frames_through_pump(tmp_path):
    """A realistic 1080p frame stream lands intact on disk."""
    target = tmp_path / "frames.bin"
    frame = np.random.default_rng(0).integers(0, 255, (1080, 1920, 3), np.uint8)
    fd = os.open(target, os.O_WRONLY | os.O_CREAT)
    pump = FramePump(fd, slot_size=frame.nbytes, slots=4)
    for _ in range(5):
        pump.submit(frame)
    pump.close()
    os.close(fd)
    data = np.fromfile(target, np.uint8).reshape(5, 1080, 1920, 3)
    for i in range(5):
        np.testing.assert_array_equal(data[i], frame)
