"""Multimodal (image/audio/video) stage plumbing.

Media travel as opaque ``binary`` columns with typed metadata columns
alongside. The Ray-side plumbing — schema handling, actor-pool batch
stages, small-batch sizing for large payloads, output layout — is real
and tested; the actual byte decoding is STUBBED (no image/audio
libraries in this environment): ``backend="fake"`` produces
deterministic synthetic outputs, ``backend="real"`` raises
``NotImplementedError`` at actor construction.

At scale these run as actor pools with small ``batch_size`` (large
binary payloads: batch × concurrency must fit worker heap —
ray_guide.md memory pitfalls).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

__all__ = ["ImageDecode", "FeatureExtract", "FrameSample"]


def _det_u32(data: bytes, salt: bytes = b"") -> int:
    return int.from_bytes(hashlib.blake2b(salt + data, digest_size=4).digest(), "little")


class ImageDecode:
    """binary → (width, height, n_pixels) metadata. Actor-pool stage:
    construct with map_batches(ImageDecode, concurrency=N, batch_size=B).
    """

    def __init__(self, backend: str = "fake"):
        if backend != "fake":
            raise NotImplementedError(
                "real image decoding needs an image library not present in "
                "this environment; run with backend='fake'"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights = [], []
        for v in batch["image"]:
            data = v.as_py() or b""
            widths.append(16 + _det_u32(data, b"w") % 4080)
            heights.append(16 + _det_u32(data, b"h") % 4080)
        w = pa.array(widths, type=pa.int32())
        h = pa.array(heights, type=pa.int32())
        import pyarrow.compute as pc

        return batch.append_column("width", w).append_column("height", h).append_column(
            "n_pixels", pc.multiply(w.cast(pa.int64()), h.cast(pa.int64()))
        )


class FeatureExtract:
    """binary → fixed-dim float32 feature vector (deterministic fake).

    The real version would load a model ONCE here (__init__) and run
    batched inference in __call__ — the actor-pool contract is
    identical.
    """

    def __init__(self, dim: int = 64, backend: str = "fake"):
        if backend != "fake":
            raise NotImplementedError("no model runtime in this environment")
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for v in batch["image"]:
            data = v.as_py() or b""
            seed = _det_u32(data)
            rng = np.random.default_rng(seed)
            feats.append(rng.normal(size=self.dim).astype(np.float32))
        return batch.append_column(
            "features",
            pa.array([f.tolist() for f in feats], type=pa.list_(pa.float32())),
        )


class FrameSample:
    """video binary → every-nth synthetic frame references (id, offset)."""

    def __init__(self, every_n: int = 10, backend: str = "fake"):
        if backend != "fake":
            raise NotImplementedError("no video runtime in this environment")
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_frame = [], []
        ids = batch["video_id"].to_pylist()
        for vid, v in zip(ids, batch["video"]):
            data = v.as_py() or b""
            n_frames = 1 + _det_u32(data, b"f") % 300
            for i in range(0, n_frames, self.every_n):
                out_id.append(vid)
                out_frame.append(i)
        return pa.table(
            {
                "video_id": pa.array(out_id, type=pa.int64()),
                "frame_idx": pa.array(out_frame, type=pa.int32()),
            }
        )
