"""Pure-python audio codec for the multimodal payload surface.

WAV/PCM needs no codec library — the RIFF container and 16-bit PCM
samples are plain struct + numpy — so unlike the compressed formats the
*decode here is real*, not a deterministic stand-in:

- ``wav``  — RIFF/WAVE, PCM16 mono/stereo. Lossless for int16 input:
  decode(encode(x)) == x bit-exactly.
- compressed formats (mp3/aac/ogg: magic ``ID3``/0xFFFB/``OggS``) raise
  NotImplementedError — clearly marked stubs per the build brief (the
  container ships no codec libraries).

No counterpart exists in the reference (it parses articles, not media);
this is the training-pipeline surface a 100 TB multimodal corpus needs
(decode → feature-extract under `mapInPandas`, bytes never leaving the
stage — same shape as `codecs.images` / `operators.multimodal`).
"""

from __future__ import annotations

import struct

import numpy as np

_RIFF = b"RIFF"
_WAVE = b"WAVE"
_COMPRESSED_MAGICS = (b"ID3", b"\xff\xfb", b"OggS", b"fLaC")


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 samples — shape (n,) mono or (n, ch) — as PCM WAV."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = (
        _WAVE
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return _RIFF + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode PCM WAV → ((n, ch) int16 array, sample_rate). Compressed
    audio magics raise NotImplementedError (stub per brief)."""
    for magic in _COMPRESSED_MAGICS:
        if data[: len(magic)] == magic:
            raise NotImplementedError(
                "compressed audio decode requires codec libraries "
                "not present in this container"
            )
    if data[:4] != _RIFF or data[8:12] != _WAVE:
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    sample_rate = None
    ch = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            codec, ch, sample_rate, _, _, bits = struct.unpack("<HHIIHH", payload[:16])
            if codec != 1 or bits != 16:
                raise NotImplementedError("only PCM16 WAV is implemented")
        elif tag == b"data":
            pcm = payload
        pos += 8 + size + (size & 1)
    if sample_rate is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    arr = np.frombuffer(pcm, dtype="<i2").astype(np.int16)
    return arr.reshape(-1, ch), sample_rate
