"""Production codec seam (humid_ray.codecs): selection logic and the
per-payload stand-in fallback, testable in the sandbox (where none of
Pillow / soundfile / PyAV are installed) via injected stub modules."""

import sys
import types

import numpy as np
import pytest

from humid_ray import codecs


def test_auto_falls_back_to_sandbox():
    """No real libraries in this container: auto == sandbox codec."""
    from humid_ray.av import decode_fwav, decode_fvid_frame
    from humid_ray.png import decode_image

    assert codecs.image_decoder("auto") is decode_image
    assert codecs.audio_decoder("auto") is decode_fwav
    assert codecs.video_frame_decoder("auto") is decode_fvid_frame


def test_sandbox_forced():
    from humid_ray.png import decode_image

    assert codecs.image_decoder("sandbox") is decode_image


def test_missing_library_raises_when_forced():
    with pytest.raises(ImportError):
        codecs.image_decoder("pillow")
    with pytest.raises(ImportError):
        codecs.audio_decoder("soundfile")
    with pytest.raises(ImportError):
        codecs.video_frame_decoder("pyav")


def test_unknown_codec_rejected():
    with pytest.raises(ValueError):
        codecs.image_decoder("libjpeg-psychic")


def test_env_override(monkeypatch):
    """GRAFT_CODEC steers the auto default without touching call
    sites; an explicit prefer wins over the env."""
    from humid_ray.png import decode_image

    monkeypatch.setenv(codecs.ENV_VAR, "sandbox")
    assert codecs.image_decoder("auto") is decode_image
    monkeypatch.setenv(codecs.ENV_VAR, "pillow")
    with pytest.raises(ImportError):
        codecs.image_decoder("auto")
    # explicit sandbox ignores the env's pillow
    assert codecs.image_decoder("sandbox") is decode_image


def test_pillow_path_with_stub(monkeypatch):
    """With a (stub) PIL importable, auto selects it for real
    containers but still routes the sandbox's FJPG through the
    stand-in decoder — the mixed-corpus guarantee."""
    from humid_ray.png import decode_image, encode_fjpg, encode_png

    seen = []

    class _Ctx:
        def __init__(self, arr):
            self.arr = arr

        def __enter__(self):
            return self.arr

        def __exit__(self, *a):
            return False

    def _open(bio):
        seen.append(bio.getvalue()[:4])
        return _Ctx(np.full((2, 2), 7, dtype=np.uint8))

    pil = types.ModuleType("PIL")
    pil.Image = types.SimpleNamespace(open=_open)
    monkeypatch.setitem(sys.modules, "PIL", pil)

    dec = codecs.image_decoder("auto")
    assert dec is not decode_image  # stub picked up

    base = np.arange(64, dtype=np.uint8).reshape(8, 8)
    png = encode_png(base)
    out = dec(png)
    assert out.shape == (2, 2) and seen == [png[:4]]  # went through PIL

    fj = encode_fjpg(base)
    out2 = dec(fj)  # FJPG: per-payload fallback, PIL never sees it
    assert out2.shape == base.shape and len(seen) == 1
    assert np.array_equal(out2, decode_image(fj))


def test_signature_extractor_honors_codec_config(monkeypatch):
    """cfg.codec='sandbox' pins the recorded pHash values even when a
    (stub) PIL is importable; cfg.codec='auto' would pick the stub."""
    from humid_ray.config import HumidConfig
    from humid_ray.png import decode_image
    from humid_ray.stages.signatures import SignatureExtractor

    pil = types.ModuleType("PIL")
    pil.Image = types.SimpleNamespace(open=lambda bio: None)
    monkeypatch.setitem(sys.modules, "PIL", pil)

    sx = SignatureExtractor(HumidConfig(codec="sandbox"))
    assert sx._decode is decode_image
    sx2 = SignatureExtractor(HumidConfig(codec="auto"))
    assert sx2._decode is not decode_image
