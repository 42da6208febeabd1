"""CLI surface: codec flags with per-codec option validation, and
module-registered commands (reference ffmpeg.py:954-1006, module.py:108-111)."""

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO / "examples" / "basic"))
sys.path.insert(0, str(REPO / "examples"))

from shaderflow_tpu.cli import launch
from shaderflow_tpu.scene import ShaderScene


class TinyScene(ShaderScene):
    """Minimal scene for CLI dispatch tests."""


def test_vcodec_flags_apply(tmp_path):
    out = tmp_path / "o.rgb"
    launch([TinyScene], ["TinyScene", "main", "-o", str(out),
                         "--vcodec", "h265", "--crf", "22",
                         "-w", "64", "--height", "36", "-f", "5", "-t", "0.4"])
    assert out.exists() and out.stat().st_size == 2 * 64 * 36 * 3


def test_vcodec_option_validation(tmp_path, caplog):
    # --cq belongs to NVENC codecs, not x264 -> loud rejection, no render
    out = tmp_path / "o.rgb"
    result = launch([TinyScene], ["TinyScene", "main", "-o", str(out),
                                  "--vcodec", "h264", "--cq", "20"])
    assert result is None
    assert not out.exists()


def test_chained_codec_subcommands(tmp_path):
    """Reference grammar (ffmpeg.py:954-1006): codec/filter subcommands
    chain after `main`, each owning its flags until the next command."""
    out = tmp_path / "o.rgb"
    captured = {}

    class Probe(TinyScene):
        def main(self, **kw):
            captured["ffmpeg"] = self.ffmpeg
            return super().main(**kw)

    Probe.__name__ = "Probe"
    launch([Probe], ["Probe", "main", "-o", str(out),
                     "-w", "64", "--height", "36", "-f", "5", "-t", "0.4",
                     "h265", "--crf", "22", "--preset", "fast",
                     "aac", "--bitrate", "96k",
                     "scale", "--width", "1280"])
    ff = captured["ffmpeg"]
    assert ff.vcodec.codec == "libx265"
    assert ff.vcodec.extra["crf"] == 22
    assert ff.vcodec.extra["preset"] == "fast"
    assert ff.acodec.extra["b:a"] == "96k"
    # The user's chained filter must survive the exporter's per-export
    # cleanup (exporting.py ffmpeg_clean keeps non-exporter filters; the
    # end-to-end -vf assembly is pinned by test_ffmpeg's command tests)
    assert any("scale=1280" in str(f) for f in ff.filters)
    assert out.exists() and out.stat().st_size == 2 * 64 * 36 * 3


def test_chained_reference_aliases_and_flag_values(tmp_path):
    # acopy/anone/aempty + dashed names resolve; `--vcodec h264` stays a
    # flag pair (the value is never read as a chain command)
    out = tmp_path / "o.rgb"
    captured = {}

    class Probe(TinyScene):
        def main(self, **kw):
            captured["ffmpeg"] = self.ffmpeg
            return super().main(**kw)

    Probe.__name__ = "Probe"
    launch([Probe], ["Probe", "main", "-o", str(out),
                     "-w", "32", "--height", "18", "-f", "5", "-t", "0.2",
                     "--vcodec", "h264", "--crf", "18",
                     "av1-svt", "--preset", "6", "anone"])
    ff = captured["ffmpeg"]
    assert ff.vcodec.codec == "libsvtav1"      # chained command wins (last set)
    assert ff.vcodec.extra["preset"] == 6
    assert ff.acodec.args(ff) == ["-an"]       # anone -> no_audio


def test_chained_bad_option_rejected(tmp_path, capsys):
    out = tmp_path / "o.rgb"
    result = launch([TinyScene], ["TinyScene", "main", "-o", str(out),
                                  "h264", "--cq", "20"])  # --cq is NVENC-only
    assert result is None
    assert not out.exists()


def test_qsv_amf_stub_codecs():
    from shaderflow_tpu.io.ffmpeg import FFmpeg
    ff = FFmpeg()
    ff.h265_qsv(crf=30)
    assert ff.vcodec.codec == "hevc_qsv"
    ff.h264_amf()
    assert ff.vcodec.codec == "h264_amf"


def test_module_command_dispatch(capsys):
    import piano_roll
    launch([piano_roll.PianoRoll], ["PianoRoll", "midi-stats"])
    captured = capsys.readouterr()
    assert "notes:" in captured.out
    assert "tempo changes:" in captured.out


def test_audio_device_commands(capsys):
    import demo
    launch([demo.Visualizer], ["Visualizer", "print-recorders"])
    # No sound server in CI: the command must still dispatch and report
    captured = capsys.readouterr()
    assert "recorder" in captured.out or "soundcard unavailable" in captured.out


def test_unknown_module_command(caplog):
    result = launch([TinyScene], ["TinyScene", "bogus-command"])
    assert result is None


def test_bundled_scene_discovery_without_file(capsys):
    """`python -m shaderflow_tpu` with no file discovers the bundled
    examples, mirroring the reference launcher's package discovery."""
    from shaderflow_tpu.cli import bundled_scenes, main

    names = {scene.__name__ for scene in bundled_scenes()}
    assert {"Basic", "Visualizer", "Mandelbrot", "Life", "PianoRoll"} <= names

    main([])  # listing mode must not raise
    out = capsys.readouterr().out
    assert "Visualizer" in out and "Usage" in out


def test_bundled_scenes_resources_fallback(tmp_path, monkeypatch):
    """Installed wheels carry examples at shaderflow_tpu/resources/examples
    (setup.py force-include, reference pyproject.toml:47-48); discovery must
    fall back there when the source-tree sibling is absent."""
    import shutil
    from pathlib import Path
    import shaderflow_tpu
    from shaderflow_tpu import cli

    repo = Path(shaderflow_tpu.__file__).resolve().parent.parent
    fake_pkg = tmp_path / "site" / "shaderflow_tpu"
    fake_pkg.mkdir(parents=True)
    (fake_pkg / "__init__.py").write_text("")
    target = fake_pkg / "resources" / "examples"
    shutil.copytree(repo / "examples", target,
                    ignore=shutil.ignore_patterns("assets", "__pycache__"))

    # Point the real package's __file__ at the fake install layout: the
    # scenes themselves still import the real shaderflow_tpu internals.
    monkeypatch.setattr(shaderflow_tpu, "__file__", str(fake_pkg / "__init__.py"))
    scenes = cli.bundled_scenes()
    names = {s.__name__ for s in scenes}
    assert {"Basic", "Visualizer", "Mandelbrot"} <= names
