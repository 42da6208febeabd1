"""FFmpeg command builder: pure string assembly (no binary required)."""

import pytest

from shaderflow_tpu.io.ffmpeg import PCM, PCM_FORMATS, FFmpeg


def cmd(ff: FFmpeg) -> str:
    return " ".join(ff.command)


def test_requires_input_and_output():
    with pytest.raises(ValueError):
        FFmpeg().command
    with pytest.raises(ValueError):
        FFmpeg().input("a.mp4").command


def test_pipe_input_rawvideo():
    ff = (FFmpeg().pipe_input(width=1920, height=1080, framerate=60.0,
                              pixel_format="rgb24")
          .h264(preset="slow", crf=20).output("out.mp4"))
    line = cmd(ff)
    assert "-f rawvideo" in line
    assert "-s 1920x1080" in line
    assert "-r 60.0" in line
    assert "-pix_fmt rgb24" in line
    assert "-i -" in line
    assert "-c:v libx264" in line
    assert "-preset slow" in line
    assert "-crf 20" in line
    assert line.endswith("-y out.mp4")


def test_all_video_codecs_assemble():
    for method, codec in [("h264", "libx264"), ("h264_nvenc", "h264_nvenc"),
                          ("h265", "libx265"), ("h265_nvenc", "hevc_nvenc"),
                          ("av1_svt", "libsvtav1"), ("av1_rav1e", "librav1e"),
                          ("av1_nvenc", "av1_nvenc"), ("rawvideo", "rawvideo"),
                          ("copy_video", "copy")]:
        ff = getattr(FFmpeg().input("a.mp4"), method)().output("b.mkv")
        assert f"-c:v {codec}" in cmd(ff), method
    assert "-vn" in cmd(FFmpeg().input("a.mp4").no_video().output("b.mkv"))


def test_all_audio_codecs_assemble():
    for method, codec in [("aac", "aac"), ("mp3", "libmp3lame"), ("opus", "libopus"),
                          ("flac", "flac"), ("copy_audio", "copy")]:
        ff = getattr(FFmpeg().input("a.wav"), method)().output("b.mka")
        assert f"-c:a {codec}" in cmd(ff), method
    assert "-an" in cmd(FFmpeg().input("a.wav").no_audio().output("b.mkv"))
    assert "anullsrc" in cmd(FFmpeg(time=5).input("a.mp4").empty_audio().output("b.mp4"))


def test_pcm_formats():
    assert len(PCM_FORMATS) == 18
    pcm = PCM("pcm_f32le")
    assert pcm.size == 4
    assert pcm.dtype.itemsize == 4
    line = cmd(FFmpeg().input("a.wav").pcm("pcm_s16le").output("-"))
    assert "-c:a pcm_s16le" in line
    assert "-f s16le" in line


def test_filters():
    ff = (FFmpeg().input("a.mp4").h264()
          .scale(width=1280, height=720).vflip().filter("eq=gamma=1.2")
          .output("b.mp4"))
    line = cmd(ff)
    assert "-vf scale=1280:720:flags=lanczos,vflip,eq=gamma=1.2" in line


def test_global_options():
    ff = FFmpeg(time=12.5, shortest=True, hwaccel="cuda", vsync="cfr",
                stream_loop=2).quiet().input("a.mp4").output("b.mp4")
    line = cmd(ff)
    assert "-loglevel error" in line
    assert "-t 12.5" in line
    assert "-shortest" in line
    assert "-hwaccel cuda" in line
    assert "-vsync cfr" in line
    assert "-stream_loop 2" in line


def test_clear():
    ff = FFmpeg().input("a.mp4").h264().aac().scale(width=2).output("b.mp4")
    ff.clear(video_codec=False)
    assert ff.vcodec is not None
    assert not ff.inputs and not ff.outputs and not ff.filters
    assert ff.acodec is None


def test_pipe_output_format():
    line = cmd(FFmpeg().input("a.mp4").pipe_output(format="matroska"))
    assert line.endswith("-f matroska -")
