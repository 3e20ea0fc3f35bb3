"""Multimodal (image/audio/video) actor-pool stages.

Media travel as opaque ``binary`` columns with typed metadata columns
alongside.  Two backends:

- ``backend="real"`` (default): pure stdlib+numpy decoders — binary PPM
  (P6) / PGM (P5), uncompressed 24/32-bit BMP, RIFF/WAV PCM via the
  stdlib ``wave`` module, and a self-describing raw-frame video
  container (``RAWV``).  No third-party media library is needed, and
  the pixel/sample math is genuinely computed from the bytes.
- ``backend="fake"``: deterministic synthetic outputs keyed on a hash
  of the payload — kept for tests that only exercise the Ray plumbing.

At scale these run as actor pools with small ``batch_size`` (large
binary payloads: batch × concurrency must fit the worker heap —
ray_guide.md memory pitfalls); per-actor state (tables, plan buffers)
belongs in ``__init__``, per-batch work in ``__call__``.
"""

from __future__ import annotations

import hashlib
import io
import struct

import numpy as np
import pyarrow as pa

__all__ = [
    "ImageDecode", "ImageResize", "FeatureExtract", "FrameSample",
    "AudioFeatures",
    "encode_ppm", "decode_image", "encode_wav", "encode_rawv",
]


def _det_u32(data: bytes, salt: bytes = b"") -> int:
    return int.from_bytes(hashlib.blake2b(salt + data, digest_size=4).digest(), "little")


# ------------------------------------------------------------- codecs (pure)


def encode_ppm(img: np.ndarray) -> bytes:
    """uint8 (H,W) → P5 / (H,W,3) → P6 netpbm bytes."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        head = f"P5 {img.shape[1]} {img.shape[0]} 255\n"
    elif img.ndim == 3 and img.shape[2] == 3:
        head = f"P6 {img.shape[1]} {img.shape[0]} 255\n"
    else:
        raise ValueError("expected (H,W) or (H,W,3) uint8")
    return head.encode() + img.tobytes()


def _decode_netpbm(data: bytes) -> np.ndarray:
    # header: magic, whitespace-separated w h maxval, ONE whitespace, raster
    toks, pos, = [], 2
    while len(toks) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to EOL
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        toks.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = toks
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    c = 3 if data[:2] == b"P6" else 1
    px = np.frombuffer(data, dtype=np.uint8, count=w * h * c, offset=pos)
    return px.reshape(h, w, c) if c == 3 else px.reshape(h, w)


def _decode_bmp(data: bytes) -> np.ndarray:
    # BITMAPFILEHEADER (14) + BITMAPINFOHEADER; uncompressed 24/32bpp only
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    off = struct.unpack_from("<I", data, 10)[0]
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    comp = struct.unpack_from("<I", data, 30)[0]
    if comp != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, comp={comp})")
    nb = bpp // 8
    stride = (w * nb + 3) & ~3
    flipped = h > 0
    h = abs(h)
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=off)
    rows = rows.reshape(h, stride)[:, : w * nb].reshape(h, w, nb)
    img = rows[..., 2::-1]  # BGR(A) → RGB
    return img[::-1].copy() if flipped else img.copy()


def decode_image(data: bytes) -> np.ndarray:
    """PPM/PGM/BMP bytes → uint8 array (H,W[,3])."""
    if data[:2] in (b"P6", b"P5"):
        return _decode_netpbm(data)
    if data[:2] == b"BM":
        return _decode_bmp(data)
    raise ValueError("unknown image format (supported: P5/P6 netpbm, BMP)")


def encode_wav(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """int16 mono/stereo PCM → RIFF/WAV bytes (stdlib ``wave``)."""
    import wave

    s = np.ascontiguousarray(samples, dtype=np.int16)
    nch = 1 if s.ndim == 1 else s.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(s.tobytes())
    return buf.getvalue()


def _decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    import wave

    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM supported")
        n = w.getnframes()
        pcm = np.frombuffer(w.readframes(n), dtype=np.int16)
        if w.getnchannels() > 1:
            pcm = pcm.reshape(-1, w.getnchannels()).mean(axis=1).astype(np.int16)
        return pcm, w.getframerate()


_RAWV_MAGIC = b"RAWV"


def encode_rawv(frames: np.ndarray) -> bytes:
    """(n,H,W,3) or (n,H,W) uint8 frames → RAWV container bytes."""
    f = np.ascontiguousarray(frames, dtype=np.uint8)
    c = 1 if f.ndim == 3 else f.shape[3]
    n, h, w = f.shape[:3]
    head = _RAWV_MAGIC + struct.pack("<HHBI", w, h, c, n)
    return head + f.tobytes()


def _decode_rawv_header(data: bytes) -> tuple[int, int, int, int, int]:
    if data[:4] != _RAWV_MAGIC:
        raise ValueError("not a RAWV container")
    w, h, c, n = struct.unpack_from("<HHBI", data, 4)
    return w, h, c, n, 4 + struct.calcsize("<HHBI")


# ------------------------------------------------------------ actor stages


class ImageDecode:
    """binary image → (width, height, n_pixels, mean_lum) metadata.

    Actor-pool stage: ``map_batches(ImageDecode, concurrency=N,
    batch_size=B)`` — backend dispatch is resolved ONCE per actor here
    in ``__init__``, not per batch."""

    def __init__(self, backend: str = "real", col: str = "image"):
        if backend not in ("real", "fake"):
            raise ValueError(backend)
        self.backend = backend
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, lums = [], [], []
        for v in batch[self.col]:
            data = v.as_py() or b""
            if self.backend == "fake":
                widths.append(16 + _det_u32(data, b"w") % 4080)
                heights.append(16 + _det_u32(data, b"h") % 4080)
                lums.append(float(_det_u32(data, b"l") % 256))
            elif not data:
                # null/empty payload → null metadata, never a task crash
                widths.append(None)
                heights.append(None)
                lums.append(None)
            else:
                img = decode_image(data)
                heights.append(img.shape[0])
                widths.append(img.shape[1])
                lums.append(float(img.mean()))
        w = pa.array(widths, type=pa.int32())
        h = pa.array(heights, type=pa.int32())
        import pyarrow.compute as pc

        return (batch.append_column("width", w)
                .append_column("height", h)
                .append_column("n_pixels",
                               pc.multiply(w.cast(pa.int64()), h.cast(pa.int64())))
                .append_column("mean_lum", pa.array(lums, type=pa.float64())))


class ImageResize:
    """binary image → nearest-neighbour resized PPM bytes (real decode +
    vectorized index-grid resample; no interpolation library needed)."""

    def __init__(self, width: int, height: int, col: str = "image"):
        self.w, self.h, self.col = width, height, col

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for v in batch[self.col]:
            data = v.as_py()
            if not data:
                out.append(None)  # null/empty stays null
                continue
            img = decode_image(data)
            ys = (np.arange(self.h) * img.shape[0] // self.h)
            xs = (np.arange(self.w) * img.shape[1] // self.w)
            out.append(encode_ppm(img[np.ix_(ys, xs)]))
        return batch.set_column(
            batch.column_names.index(self.col), self.col,
            pa.array(out, type=pa.binary()))


class FeatureExtract:
    """binary image → fixed-dim float32 feature vector.

    real: 8×8 block-mean grayscale intensities (64-dim), L2-normalized —
    an honest content-derived embedding computed from the pixels.
    fake: hash-seeded gaussian (plumbing tests).  A model runtime would
    load its weights ONCE here in ``__init__`` — identical contract."""

    def __init__(self, dim: int = 64, backend: str = "real", col: str = "image"):
        if backend not in ("real", "fake"):
            raise ValueError(backend)
        g = int(round(dim ** 0.5))
        if backend == "real" and g * g != dim:
            raise ValueError("real backend needs a square dim (g*g)")
        self.dim, self.grid, self.backend, self.col = dim, g, backend, col

    def _real_feature(self, data: bytes) -> np.ndarray:
        img = decode_image(data).astype(np.float32)
        if img.ndim == 3:
            img = img.mean(axis=2)
        g = self.grid
        ys = (np.arange(img.shape[0]) * g // img.shape[0])
        xs = (np.arange(img.shape[1]) * g // img.shape[1])
        acc = np.zeros((g, g), dtype=np.float64)
        cnt = np.zeros((g, g), dtype=np.int64)
        np.add.at(acc, (ys[:, None], xs[None, :]), img)
        np.add.at(cnt, (ys[:, None], xs[None, :]), 1)
        f = (acc / np.maximum(cnt, 1)).ravel().astype(np.float32)
        norm = float(np.linalg.norm(f))
        return f / norm if norm else f

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for v in batch[self.col]:
            data = v.as_py() or b""
            if self.backend == "fake":
                rng = np.random.default_rng(_det_u32(data))
                feats.append(rng.normal(size=self.dim).astype(np.float32))
            elif not data:
                feats.append(None)  # null/empty payload → null feature
            else:
                feats.append(self._real_feature(data))
        return batch.append_column(
            "features",
            pa.array([f.tolist() if f is not None else None for f in feats],
                     type=pa.list_(pa.float32())),
        )


class FrameSample:
    """video binary → every-nth frame as PPM bytes (real: RAWV container
    frames are sliced zero-copy by byte range; fake: synthetic ids)."""

    def __init__(self, every_n: int = 10, backend: str = "real",
                 col: str = "video", emit_frames: bool = True):
        if backend not in ("real", "fake"):
            raise ValueError(backend)
        self.every_n, self.backend = every_n, backend
        self.col, self.emit_frames = col, emit_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_frame, out_bytes = [], [], []
        ids = batch["video_id"].to_pylist()
        for vid, v in zip(ids, batch[self.col]):
            data = v.as_py() or b""
            if self.backend == "fake":
                n_frames = 1 + _det_u32(data, b"f") % 300
                for i in range(0, n_frames, self.every_n):
                    out_id.append(vid)
                    out_frame.append(i)
                    out_bytes.append(b"")
            elif not data:
                continue  # null/empty video → no frames
            else:
                w, h, c, n, off = _decode_rawv_header(data)
                fsz = w * h * c
                for i in range(0, n, self.every_n):
                    out_id.append(vid)
                    out_frame.append(i)
                    if self.emit_frames:
                        px = np.frombuffer(
                            data, dtype=np.uint8, count=fsz, offset=off + i * fsz)
                        shape = (h, w, 3) if c == 3 else (h, w)
                        out_bytes.append(encode_ppm(px.reshape(shape)))
                    else:
                        out_bytes.append(b"")
        return pa.table(
            {
                "video_id": pa.array(out_id, type=pa.int64()),
                "frame_idx": pa.array(out_frame, type=pa.int32()),
                "frame": pa.array(out_bytes, type=pa.binary()),
            }
        )


class AudioFeatures:
    """WAV binary → (duration_s, rms, zero_cross_rate, dom_freq_hz).

    Real signal math over the PCM: RMS, zero-crossing rate, dominant
    frequency via one rfft — all numpy, no audio library."""

    def __init__(self, col: str = "audio"):
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        dur, rms, zcr, dom = [], [], [], []
        for v in batch[self.col]:
            data = v.as_py()
            if not data:  # null/empty payload → null features
                dur.append(None); rms.append(None)
                zcr.append(None); dom.append(None)
                continue
            pcm, rate = _decode_wav(data)
            x = pcm.astype(np.float64) / 32768.0
            n = max(len(x), 1)
            dur.append(len(x) / rate)
            rms.append(float(np.sqrt(np.mean(x * x))) if len(x) else 0.0)
            zcr.append(float(np.mean(np.abs(np.diff(np.signbit(x))))) if len(x) > 1 else 0.0)
            if len(x):
                spec = np.abs(np.fft.rfft(x))
                spec[0] = 0.0  # ignore DC
                dom.append(float(np.argmax(spec) * rate / n))
            else:
                dom.append(0.0)
        return (batch.append_column("duration_s", pa.array(dur, type=pa.float64()))
                .append_column("rms", pa.array(rms, type=pa.float64()))
                .append_column("zero_cross_rate", pa.array(zcr, type=pa.float64()))
                .append_column("dom_freq_hz", pa.array(dom, type=pa.float64())))
