"""Production codec seam.

The sandbox ships pure-Python stand-in codecs (``humid_ray.png``: real
PNG subset + the FJPG lossy stand-in; ``humid_ray.av``: FWAV/FVID
containers) because PIL / libjpeg-turbo / soundfile / PyAV are not
installed here. This module is the one switch a production deployment
flips: each ``*_decoder`` resolver returns the best available decode
callable — the real library when importable, the sandbox codec
otherwise — and is meant to be called ONCE per actor in ``__init__``
(the reference's analog is its vendored fastp/isa-l submodule seam,
/root/reference/.gitmodules:1-12).

Selection: ``prefer="auto"`` (the default everywhere) picks the real
library iff importable; ``"sandbox"`` forces the stand-ins (what every
recorded benchmark/oracle in this repo uses — decode-valued outputs
such as pHash and decode-stats are codec-dependent, so switching
codecs legitimately changes them); a library name (``"pillow"``,
``"soundfile"``, ``"pyav"``) forces that library and raises
``ImportError`` if absent rather than silently degrading.

Library-backed decoders still fall back to the sandbox codec PER
PAYLOAD for the sandbox's own containers (FJPG/FWAV/FVID magic), so a
mixed corpus decodes under either selection.
"""

from __future__ import annotations

import os

import numpy as np

#: env override consulted by the "auto" default — lets a deployment
#: force codecs without touching call sites (e.g. GRAFT_CODEC=sandbox
#: to reproduce the recorded pHash values under an installed Pillow).
ENV_VAR = "GRAFT_CODEC"


def _effective(prefer: str | None) -> str:
    if prefer in (None, "auto"):
        return os.environ.get(ENV_VAR, "auto")
    return prefer


def image_decoder(prefer: str | None = "auto"):
    """Resolve ``bytes -> np.ndarray`` image decode.

    auto/pillow -> PIL (grayscale stays HxW, RGB HxWx3 — the sandbox
    codec's shapes) with per-payload fallback to the sandbox codec for
    FJPG; sandbox -> ``humid_ray.png.decode_image``.
    """
    prefer = _effective(prefer)
    if prefer in ("auto", "pillow"):
        try:
            import io

            from PIL import Image  # noqa: PLC0415

            from humid_ray.png import FJPG_MAGIC, decode_image as _sandbox

            def _pil(b: bytes) -> np.ndarray:
                if b[:4] == FJPG_MAGIC:  # sandbox-only container
                    return _sandbox(b)
                with Image.open(io.BytesIO(b)) as im:
                    return np.asarray(im)

            return _pil
        except ImportError:
            if prefer == "pillow":
                raise
    elif prefer != "sandbox":
        raise ValueError(f"unknown image codec {prefer!r}")
    from humid_ray.png import decode_image

    return decode_image


def audio_decoder(prefer: str | None = "auto"):
    """Resolve ``bytes -> (np.ndarray, sr)`` audio decode (the
    ``humid_ray.av.decode_fwav`` return shape).

    auto/soundfile -> libsndfile via the soundfile package with
    per-payload fallback to the FWAV stand-in; sandbox ->
    ``humid_ray.av.decode_fwav``.
    """
    prefer = _effective(prefer)
    if prefer in ("auto", "soundfile"):
        try:
            import io

            import soundfile as sf  # noqa: PLC0415

            from humid_ray.av import FWAV_MAGIC, decode_fwav as _sandbox

            def _sf(b: bytes):
                if b[: len(FWAV_MAGIC)] == FWAV_MAGIC:
                    return _sandbox(b)
                data, sr = sf.read(io.BytesIO(b), dtype="int16")
                return np.asarray(data), int(sr)

            return _sf
        except ImportError:
            if prefer == "soundfile":
                raise
    elif prefer != "sandbox":
        raise ValueError(f"unknown audio codec {prefer!r}")
    from humid_ray.av import decode_fwav

    return decode_fwav


def video_frame_decoder(prefer: str | None = "auto"):
    """Resolve ``(bytes, frame_index) -> np.ndarray`` video frame
    decode.

    auto/pyav -> PyAV demux/decode with per-payload fallback to the
    FVID stand-in; sandbox -> ``humid_ray.av.decode_fvid_frame``.
    """
    prefer = _effective(prefer)
    if prefer in ("auto", "pyav"):
        try:
            import io

            import av as _pyav  # noqa: PLC0415

            from humid_ray.av import FVID_MAGIC, decode_fvid_frame as _sandbox

            def _av(b: bytes, idx: int) -> np.ndarray:
                if b[: len(FVID_MAGIC)] == FVID_MAGIC:
                    return _sandbox(b, idx)
                with _pyav.open(io.BytesIO(b)) as container:
                    for i, frame in enumerate(container.decode(video=0)):
                        if i == idx:
                            return frame.to_ndarray(format="gray")
                raise IndexError(idx)

            return _av
        except ImportError:
            if prefer == "pyav":
                raise
    elif prefer != "sandbox":
        raise ValueError(f"unknown video codec {prefer!r}")
    from humid_ray.av import decode_fvid_frame

    return decode_fvid_frame
