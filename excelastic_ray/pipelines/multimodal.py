"""Multimodal binary-column plumbing (real decode behind auto-detect).

Images/audio/video are opaque ``binary`` columns with typed metadata;
decode / feature-extract / resize run as actor-pool ``map_batches``
stages. The image/audio libraries are NOT in this container, so with
``fake=True`` (default) a deterministic fake decoder derives
shape/features from the payload bytes so the Ray plumbing — schema,
batch size, actor signature, output layout — is real and tested; with
``fake=False`` the actor AUTO-DETECTS the codec at init (PIL for
images when importable) and otherwise raises ``NotImplementedError``
at the exact point a real codec (PIL / torchaudio / pyav) would slot
in. A skip-marked pytest activates the real path if the container ever
gains PIL.

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


def _try_import_pil():
    """Auto-detect the real image codec (PIL) — None when absent."""
    try:  # pragma: no cover - lib absent in this container
        from PIL import Image

        return Image
    except ImportError:
        return None


class DecodeMedia:
    """Actor-pool decode stage: payload → (height, width, n_channels) for
    images / (n_samples, sample_rate) for audio.

    ``fake=False`` AUTO-DETECTS the codec at actor init (once per
    actor, the model-load slot): image payloads decode through PIL when
    it is importable; without PIL (this container) init raises the
    documented ``NotImplementedError``. Audio decode would need
    torchaudio and stays stubbed either way."""

    def __init__(self, fake: bool = True):
        self.fake = fake
        self._pil = None
        if not fake:
            self._pil = _try_import_pil()
            if self._pil is None:
                raise NotImplementedError(
                    "real media decode needs PIL/torchaudio; run with fake=True"
                )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        sizes = np.fromiter((len(p) for p in payloads), dtype=np.int64,
                            count=len(payloads))
        if not self.fake:  # pragma: no cover - needs PIL
            import io

            kinds = batch["kind"].to_pylist()
            h = np.empty(len(payloads), dtype=np.int64)
            w = np.empty(len(payloads), dtype=np.int64)
            c = np.empty(len(payloads), dtype=np.int64)
            for i, (kind, p) in enumerate(zip(kinds, payloads)):
                if kind != "image":
                    raise NotImplementedError(
                        "real audio/video decode needs torchaudio/pyav"
                    )
                img = self._pil.open(io.BytesIO(p or b""))
                w[i], h[i] = img.size
                c[i] = len(img.getbands())
        else:
            # Deterministic fake: shape derived from payload length.
            h = (sizes % 480) + 1
            w = (sizes % 640) + 1
            c = np.full(len(sizes), 3, dtype=np.int64)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "n_bytes": pa.array(sizes),
                "height": pa.array(h),
                "width": pa.array(w),
                "n_channels": pa.array(c),
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


class ResizeMedia:
    """Actor-pool resize stage: (height, width) → bounded (h', w')
    preserving aspect ratio (the standard image-pipeline letterbox
    computation — REAL math over the decoded metadata; only the pixel
    resample itself would need PIL and is stubbed)."""

    def __init__(self, max_side: int = 224, fake: bool = True):
        self.max_side = max_side
        if not fake:  # pragma: no cover
            raise NotImplementedError("real pixel resample needs PIL")

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = batch["height"].to_numpy().astype(np.float64)
        w = batch["width"].to_numpy().astype(np.float64)
        scale = np.minimum(1.0, self.max_side / np.maximum(h, w))
        out_h = np.maximum(1, np.floor(h * scale + 0.5)).astype(np.int64)
        out_w = np.maximum(1, np.floor(w * scale + 0.5)).astype(np.int64)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "out_height": pa.array(out_h),
                "out_width": pa.array(out_w),
            }
        )


class SampleFrames:
    """Actor-pool frame-sampling stage for video/audio payloads: emits
    ``n_frames`` evenly spaced frame indices per media row (flat_map
    shape: one output row per sampled frame). Frame count derives from
    payload length (the deterministic fake for a real container parse);
    the frame-index math is the real kernel."""

    def __init__(self, n_frames: int = 4, bytes_per_frame: int = 64,
                 fake: bool = True):
        self.n_frames = n_frames
        self.bytes_per_frame = bytes_per_frame
        if not fake:  # pragma: no cover
            raise NotImplementedError("real frame decode needs pyav")

    def __call__(self, batch: pa.Table) -> pa.Table:
        sizes = np.fromiter(
            (len(p) for p in batch["payload"].to_pylist()), dtype=np.int64,
            count=batch.num_rows,
        )
        total = np.maximum(sizes // self.bytes_per_frame, 1)
        take = np.minimum(total, self.n_frames)
        ids = batch["media_id"].to_numpy()
        out_id, out_frame, out_total = [], [], []
        for i in range(batch.num_rows):
            # evenly spaced: floor(j * total / take), j = 0..take-1
            j = np.arange(take[i], dtype=np.int64)
            out_frame.append(j * total[i] // take[i])
            out_id.append(np.full(take[i], ids[i], dtype=np.int64))
            out_total.append(np.full(take[i], total[i], dtype=np.int64))
        return pa.table(
            {
                "media_id": pa.array(np.concatenate(out_id)),
                "frame_idx": pa.array(np.concatenate(out_frame)),
                "n_frames_total": pa.array(np.concatenate(out_total)),
            }
        )


def resize_media(ds, max_side: int = 224, concurrency=None,
                 batch_size: int = 256, fake: bool = True):
    return ds.map_batches(
        ResizeMedia, fn_constructor_args=(max_side, fake),
        batch_format="pyarrow", batch_size=batch_size, num_cpus=1,
        concurrency=concurrency if concurrency is not None else (1, default_pool()),
        # pool replacement + lineage is the recovery path (ray#53727:
        # ctor args live in the object store, in-place restart unreliable)
        max_restarts=0,
    )


def sample_frames(ds, n_frames: int = 4, concurrency=None,
                  batch_size: int = 256, fake: bool = True):
    return ds.map_batches(
        SampleFrames, fn_constructor_args=(n_frames, 64, fake),
        batch_format="pyarrow", batch_size=batch_size, num_cpus=1,
        concurrency=concurrency if concurrency is not None else (1, default_pool()),
        # pool replacement + lineage is the recovery path (ray#53727:
        # ctor args live in the object store, in-place restart unreliable)
        max_restarts=0,
    )


def decode_media(ds, concurrency=None, batch_size: int = 256, fake: bool = True):
    return ds.map_batches(
        DecodeMedia, fn_constructor_args=(fake,), batch_format="pyarrow",
        batch_size=batch_size, num_cpus=1,
        concurrency=concurrency if concurrency is not None else (1, default_pool()),
        # pool replacement + lineage is the recovery path (ray#53727:
        # ctor args live in the object store, in-place restart unreliable)
        max_restarts=0,
    )


def extract_features(ds, dim: int = 16, concurrency=None,
                     batch_size: int = 256, fake: bool = True):
    return ds.map_batches(
        ExtractFeatures, fn_constructor_args=(dim, fake), batch_format="pyarrow",
        batch_size=batch_size, num_cpus=1,
        concurrency=concurrency if concurrency is not None else (1, default_pool()),
        # pool replacement + lineage is the recovery path (ray#53727:
        # ctor args live in the object store, in-place restart unreliable)
        max_restarts=0,
    )
