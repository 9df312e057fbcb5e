"""Multimodal binary-column plumbing (decode stages STUBBED).

Images/audio/video are opaque ``binary`` columns with typed metadata;
decode / feature-extract / resize run as actor-pool ``map_batches``
stages. The image/audio libraries are NOT in this container, so the
decode kernel is stubbed: with ``fake=True`` (default) a deterministic
fake decoder derives shape/features from the payload bytes so the Ray
plumbing — schema, batch size, actor signature, output layout — is real
and tested; with ``fake=False`` the stage raises ``NotImplementedError``
at the exact point a real codec (PIL / torchaudio / pyav) would slot in.

Batch-size guidance: binary payloads dominate block size — size
``batch_size`` so batch_bytes × concurrency fits the worker heap
(ray_guide.md memory pitfalls).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from excelastic_ray.hashing import default_pool

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.large_binary()),
        ("mime", pa.string()),
    ]
)


def attach_fake_payloads(batch: pa.Table, id_col: str = "doc_id",
                         text_col: str = "text") -> pa.Table:
    """Build a demo media table from any table: payload = utf-8 bytes of
    the text (a deterministic opaque blob), kind cycles image/audio."""
    ids = batch[id_col].to_numpy()
    texts = batch[text_col].to_pylist()
    kinds = np.where(ids % 2 == 0, "image", "audio").astype(object)
    mimes = np.where(ids % 2 == 0, "image/png", "audio/wav").astype(object)
    return pa.table(
        {
            "media_id": pa.array(ids, type=pa.int64()),
            "kind": pa.array(kinds, type=pa.string()),
            "payload": pa.array(
                [(t or "").encode() for t in texts], type=pa.large_binary()
            ),
            "mime": pa.array(mimes, type=pa.string()),
        }
    )


class DecodeMedia:
    """Actor-pool decode stage: payload → (height, width, n_channels) for
    images / (n_samples, sample_rate) for audio. Real decode is stubbed."""

    def __init__(self, fake: bool = True):
        self.fake = fake
        if not fake:
            try:  # pragma: no cover - libs absent in this container
                import PIL.Image  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "real media decode needs PIL/torchaudio; run with fake=True"
                ) from e

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:  # pragma: no cover
            raise NotImplementedError("real decode path not available here")
        payloads = batch["payload"].to_pylist()
        sizes = np.fromiter((len(p) for p in payloads), dtype=np.int64,
                            count=len(payloads))
        # Deterministic fake: shape derived from payload length.
        h = (sizes % 480) + 1
        w = (sizes % 640) + 1
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "n_bytes": pa.array(sizes),
                "height": pa.array(h),
                "width": pa.array(w),
                "n_channels": pa.array(np.full(len(sizes), 3, dtype=np.int64)),
            }
        )


class ExtractFeatures:
    """Actor-pool feature stage: payload → fixed-dim float32 embedding.
    Fake kernel: seeded hash of the payload bytes → deterministic vector
    (the real model-inference kernel slots in here; batch inference,
    model loaded once in __init__)."""

    def __init__(self, dim: int = 16, fake: bool = True):
        self.dim = dim
        if not fake:  # pragma: no cover
            raise NotImplementedError("real feature extraction not available here")

    def __call__(self, batch: pa.Table) -> pa.Table:
        import zlib

        feats = np.empty((batch.num_rows, self.dim), dtype=np.float32)
        for i, p in enumerate(batch["payload"].to_pylist()):
            seed = zlib.crc32(p or b"")
            feats[i] = np.random.default_rng(seed).standard_normal(self.dim)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1)), self.dim
                ),
            }
        )


def decode_media(ds, concurrency=None, batch_size: int = 256, fake: bool = True):
    return ds.map_batches(
        DecodeMedia, fn_constructor_args=(fake,), batch_format="pyarrow",
        batch_size=batch_size, num_cpus=1,
        concurrency=concurrency if concurrency is not None else (1, default_pool()),
    )


def extract_features(ds, dim: int = 16, concurrency=None,
                     batch_size: int = 256, fake: bool = True):
    return ds.map_batches(
        ExtractFeatures, fn_constructor_args=(dim, fake), batch_format="pyarrow",
        batch_size=batch_size, num_cpus=1,
        concurrency=concurrency if concurrency is not None else (1, default_pool()),
    )
