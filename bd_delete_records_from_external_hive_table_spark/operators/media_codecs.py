"""Pure-Python media codecs for the multimodal pipeline's REAL decode
path.

The container ships no PIL/librosa/ffmpeg, but two classic formats are
trivially parseable with the standard library alone:

- **PPM (P6)** binary images: ASCII header (magic, width, height,
  maxval, ``#`` comments) followed by raw RGB bytes.
- **WAV** (RIFF) PCM16 audio: chunked container with an ``fmt `` chunk
  and a ``data`` chunk of little-endian 16-bit samples.

That makes ``extract_features(..., decode="real")`` a genuinely
end-to-end path — real bytes in, real pixel/sample statistics out —
through the exact same Arrow-batched ``mapInPandas`` plumbing a
PIL/ffmpeg decoder would use; swapping in richer formats later changes
only this module.

Encoders are provided too so tests (and synthetic corpora) can build
valid payloads without any media library.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "decode_ppm", "encode_ppm", "decode_wav", "encode_wav",
    "real_feature_vector",
]


# ---------------------------------------------------------------------------
# PPM (P6)
# ---------------------------------------------------------------------------

def _ppm_tokens(buf: bytes, n: int) -> tuple[list[bytes], int]:
    """First ``n`` whitespace-separated header tokens (``#`` comments
    skipped), plus the offset of the byte after the single whitespace
    that terminates the last token (the raster starts there)."""
    toks: list[bytes] = []
    i = 0
    while len(toks) < n:
        if i >= len(buf):
            raise ValueError("truncated PPM header")
        c = buf[i:i + 1]
        if c == b"#":
            while i < len(buf) and buf[i:i + 1] != b"\n":
                i += 1
            i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(buf) and not buf[j:j + 1].isspace():
                j += 1
            toks.append(buf[i:j])
            i = j
            if len(toks) == n:
                i += 1  # exactly one whitespace ends the header
    return toks, i


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval < 256) → uint8 array of shape (h, w, 3)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    toks, off = _ppm_tokens(payload, 4)  # magic, width, height, maxval
    w, h, maxval = int(toks[1]), int(toks[2]), int(toks[3])
    if maxval <= 0 or maxval > 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    need = w * h * 3
    raster = payload[off:off + need]
    if len(raster) < need:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def encode_ppm(pixels: np.ndarray) -> bytes:
    """uint8 (h, w, 3) → binary PPM (P6) payload."""
    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("encode_ppm expects (h, w, 3)")
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


# ---------------------------------------------------------------------------
# WAV (RIFF / PCM16)
# ---------------------------------------------------------------------------

def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 → (mono float32 samples in [-1, 1], sample_rate).

    Walks the chunk list (tolerating extra chunks like LIST/fact);
    multi-channel audio is averaged down to mono.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= n:
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"only PCM16 supported (fmt={audio_format}, "
                         f"bits={bits})")
    samples = np.frombuffer(
        data[:len(data) - (len(data) % (2 * channels))], dtype="<i2")
    if channels > 1:
        samples = samples.reshape(-1, channels).mean(axis=1)
    return samples.astype(np.float32) / 32768.0, sample_rate


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Mono float samples in [-1, 1] → RIFF/WAVE PCM16 payload."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm16 = (pcm * 32767.0).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm16)) + pcm16)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


# ---------------------------------------------------------------------------
# Feature extraction over decoded media
# ---------------------------------------------------------------------------

def real_feature_vector(payload: bytes, dim: int) -> np.ndarray:
    """Fixed-``dim`` float32 features from a REAL decoded payload.

    Format is sniffed from magic bytes. Image features: per-channel
    mean/std (6 values) then a normalized grayscale histogram over the
    remaining bins. Audio features: mean/RMS/zero-crossing-rate (3
    values) then a normalized amplitude histogram. Deterministic —
    identical payload bytes give identical features on every executor.
    """
    if payload[:2] == b"P6":
        px = decode_ppm(payload).astype(np.float32)
        head = np.concatenate([px.mean(axis=(0, 1)) / 255.0,
                               px.std(axis=(0, 1)) / 255.0])
        gray = px.mean(axis=2).ravel() / 255.0
        tail_bins = max(dim - head.size, 0)
        if tail_bins:
            hist, _ = np.histogram(gray, bins=tail_bins, range=(0.0, 1.0))
            tail = hist.astype(np.float32) / max(gray.size, 1)
            vec = np.concatenate([head, tail])
        else:
            vec = head
    elif payload[:4] == b"RIFF":
        samples, _rate = decode_wav(payload)
        if samples.size == 0:
            vec = np.zeros(3, dtype=np.float32)
        else:
            zcr = float(np.mean(np.abs(np.diff(np.signbit(
                samples).astype(np.int8)))))
            vec = np.array([float(samples.mean()),
                            float(np.sqrt(np.mean(samples ** 2))),
                            zcr], dtype=np.float32)
        tail_bins = max(dim - vec.size, 0)
        if tail_bins:
            hist, _ = np.histogram(samples, bins=tail_bins,
                                   range=(-1.0, 1.0))
            vec = np.concatenate([
                vec, hist.astype(np.float32) / max(samples.size, 1)])
    else:
        raise ValueError("unrecognized media payload (expected PPM or WAV)")
    out = np.zeros(dim, dtype=np.float32)
    out[:min(dim, vec.size)] = vec[:dim]
    return out
