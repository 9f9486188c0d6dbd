"""Multimodal column stages: image decode / resize / feature-extract as
actor-pool ``map_batches`` transforms over opaque ``binary`` columns.

The Ray-side plumbing is real and tested — zero-copy Arrow binary
batches in, actor pools with per-actor codec state, small batch sizes
for wide binary rows, narrow typed outputs (pixels never leave the
stage). The codecs are this repo's pure-python PNG and the
clearly-marked lossy stand-in (functions.imagecodec) because no image
library exists in this container; swap the codec calls for
PIL/libjpeg/ffmpeg when available.

Audio/video decode are declared with real schemas and raise
NotImplementedError at the decode call — the documented stub pattern.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from ..functions.imagecodec import decode_image, phash64


class ChannelMomentPartials:
    """Actor stage: decode → ONE row of exact integer per-channel pixel
    moments per input block (pixel count, Σx and Σx² for R/G/B as
    int64) — the map side of corpus normalization-constant computation
    (the dataset mean/std a vision trainer bakes into its input
    transform). 255²·n overflows int64 only past ~1.4·10¹⁴ pixels per
    BLOCK, far beyond any block size, so the partials are exact;
    pixels never leave the stage and the driver folds only
    blocks-many 7-int rows."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = 0
        s = np.zeros(3, dtype=np.int64)
        s2 = np.zeros(3, dtype=np.int64)
        for r in batch.select(["bytes", "fmt"]).to_pylist():
            px = decode_image(r["bytes"], r["fmt"]).astype(np.int64)
            n += px.shape[0] * px.shape[1]
            s += px.sum(axis=(0, 1))
            s2 += (px * px).sum(axis=(0, 1))
        return pa.table(
            {
                "n_px": pa.array([n], pa.int64()),
                "sum_r": pa.array([int(s[0])], pa.int64()),
                "sum_g": pa.array([int(s[1])], pa.int64()),
                "sum_b": pa.array([int(s[2])], pa.int64()),
                "sumsq_r": pa.array([int(s2[0])], pa.int64()),
                "sumsq_g": pa.array([int(s2[1])], pa.int64()),
                "sumsq_b": pa.array([int(s2[2])], pa.int64()),
            }
        )


class ChannelCovariancePartials:
    """Actor stage: decode → ONE row of exact integer cross-channel
    pixel moments per input block (n, Σx per channel, and all six
    Σx·y second moments) — the map side of the corpus COLOR COVARIANCE
    matrix, the statistic behind ZCA/whitening transforms and the
    PCA-based color augmentation of Krizhevsky et al. 2012.  Same
    exactness argument as ChannelMomentPartials (255²·n per block is
    far inside int64); pixels never leave the stage and the driver
    folds blocks-many 10-int rows."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = 0
        s = np.zeros(3, dtype=np.int64)
        xx = np.zeros((3, 3), dtype=np.int64)
        for r in batch.select(["bytes", "fmt"]).to_pylist():
            px = decode_image(r["bytes"], r["fmt"]).astype(np.int64)
            flat = px.reshape(-1, 3)
            n += flat.shape[0]
            s += flat.sum(axis=0)
            xx += flat.T @ flat
        return pa.table(
            {
                "n_px": pa.array([n], pa.int64()),
                "sum_r": pa.array([int(s[0])], pa.int64()),
                "sum_g": pa.array([int(s[1])], pa.int64()),
                "sum_b": pa.array([int(s[2])], pa.int64()),
                "s_rr": pa.array([int(xx[0, 0])], pa.int64()),
                "s_gg": pa.array([int(xx[1, 1])], pa.int64()),
                "s_bb": pa.array([int(xx[2, 2])], pa.int64()),
                "s_rg": pa.array([int(xx[0, 1])], pa.int64()),
                "s_rb": pa.array([int(xx[0, 2])], pa.int64()),
                "s_gb": pa.array([int(xx[1, 2])], pa.int64()),
            }
        )


class LumaHistogramPartials:
    """Actor stage: decode → one ≤256-row integer luminance-bincount
    partial per block. Luma is INTEGER ITU-601
    ((299·R + 587·G + 114·B) // 1000 per pixel), so partials are exact
    and commutative; pixels never leave the stage. Feeds the corpus
    histogram-equalization LUT (queries.corpus_luma_histogram)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        hist = np.zeros(256, dtype=np.int64)
        for r in batch.select(["bytes", "fmt"]).to_pylist():
            px = decode_image(r["bytes"], r["fmt"]).astype(np.int64)
            luma = (299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]) // 1000
            hist += np.bincount(luma.ravel(), minlength=256)
        lv = np.flatnonzero(hist)
        return pa.table(
            {
                "level": pa.array(lv.astype(np.int64)),
                "n": pa.array(hist[lv]),
            }
        )


class ExposureBlurStats:
    """Actor stage: decode → per-image exposure and sharpness features,
    all from exact integer pixel math — the image-quality filter pass a
    curation pipeline runs before training (drop over/under-exposed and
    blurry frames). Per image: dark/bright pixel counts on ITU-601
    integer luma (thresholds 16 / 239, the broadcast-video range), and
    the Laplacian-variance sharpness score (4-neighbour kernel on the
    interior, variance from exact int64 Σ/Σ²; the only floats are the
    two final divisions). Pixels never leave the stage."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, dark, bright, npx, lvar, nint = [], [], [], [], [], []
        for r in batch.select(["image_id", "bytes", "fmt"]).to_pylist():
            px = decode_image(r["bytes"], r["fmt"]).astype(np.int64)
            luma = (299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]) // 1000
            ids.append(r["image_id"])
            npx.append(int(luma.size))
            dark.append(int((luma < 16).sum()))
            bright.append(int((luma > 239).sum()))
            if luma.shape[0] >= 3 and luma.shape[1] >= 3:
                c = luma[1:-1, 1:-1]
                lap = (
                    4 * c
                    - luma[:-2, 1:-1]
                    - luma[2:, 1:-1]
                    - luma[1:-1, :-2]
                    - luma[1:-1, 2:]
                )
                n = int(lap.size)
                s = int(lap.sum())
                s2 = int((lap * lap).sum())
                mean = s / n
                lvar.append(s2 / n - mean * mean)
                nint.append(n)
            else:
                lvar.append(0.0)
                nint.append(0)
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "n_px": pa.array(npx, pa.int64()),
                "n_dark": pa.array(dark, pa.int64()),
                "n_bright": pa.array(bright, pa.int64()),
                "lap_var": pa.array(lvar, pa.float64()),
                "n_interior": pa.array(nint, pa.int64()),
            }
        )


class SobelEdgeStats:
    """Actor stage: decode → per-image Sobel edge statistics, exact
    integer end-to-end — the structure/texture gate a curation pipeline
    pairs with the exposure/blur filter (flat synthetic fills and
    over-compressed frames score near zero; busy natural scenes score
    high). Per image on ITU-601 integer luma: 3×3 Sobel Gx/Gy over the
    interior via pure array slicing, per-pixel energy |Gx|+|Gy| (the
    L1 gradient magnitude — no sqrt, stays int64), Σenergy, and the
    count of pixels at/above ``edge_threshold``. Pixels never leave
    the stage."""

    def __init__(self, edge_threshold: int = 128):
        self.edge_threshold = int(edge_threshold)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, nint, energy, nedge = [], [], [], []
        for r in batch.select(["image_id", "bytes", "fmt"]).to_pylist():
            px = decode_image(r["bytes"], r["fmt"]).astype(np.int64)
            luma = (299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]) // 1000
            ids.append(r["image_id"])
            if luma.shape[0] >= 3 and luma.shape[1] >= 3:
                gx = (
                    (luma[:-2, 2:] + 2 * luma[1:-1, 2:] + luma[2:, 2:])
                    - (luma[:-2, :-2] + 2 * luma[1:-1, :-2] + luma[2:, :-2])
                )
                gy = (
                    (luma[2:, :-2] + 2 * luma[2:, 1:-1] + luma[2:, 2:])
                    - (luma[:-2, :-2] + 2 * luma[:-2, 1:-1] + luma[:-2, 2:])
                )
                e = np.abs(gx) + np.abs(gy)
                nint.append(int(e.size))
                energy.append(int(e.sum()))
                nedge.append(int((e >= self.edge_threshold).sum()))
            else:
                nint.append(0)
                energy.append(0)
                nedge.append(0)
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "n_interior": pa.array(nint, pa.int64()),
                "edge_energy": pa.array(energy, pa.int64()),
                "n_edge": pa.array(nedge, pa.int64()),
            }
        )


class GrayWorldGains:
    """Actor stage: decode → per-IMAGE gray-world white-balance gains.
    Gray-world assumes the average scene is achromatic, so
    gain_c = (Σr+Σg+Σb) / (3·Σc) rescales each channel until the
    channel means equalize — the classic color-constancy correction a
    crawl-scale image pipeline applies before embedding or training.
    Channel sums are exact int64 per image; the single float division
    per channel is the documented final op (gain = 1.0 for an all-zero
    channel, where gray-world is undefined), so the output is
    bit-reproducible under any block layout. Pixels never leave the
    stage."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, npx = [], []
        gains = ([], [], [])
        for r in batch.select(["image_id", "bytes", "fmt"]).to_pylist():
            px = decode_image(r["bytes"], r["fmt"]).astype(np.int64)
            s = px.sum(axis=(0, 1))
            tot = int(s[0]) + int(s[1]) + int(s[2])
            ids.append(r["image_id"])
            npx.append(px.shape[0] * px.shape[1])
            for c in range(3):
                gains[c].append(tot / (3 * int(s[c])) if int(s[c]) else 1.0)
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "n_px": pa.array(npx, pa.int64()),
                "gain_r": pa.array(gains[0], pa.float64()),
                "gain_g": pa.array(gains[1], pa.float64()),
                "gain_b": pa.array(gains[2], pa.float64()),
            }
        )


class TilePhashes:
    """Actor stage: decode → one 64-bit perceptual hash PER QUADRANT
    (2×2 tile grid) — the signature layer of partial-duplicate image
    detection: a crop, collage, or watermarked re-post shares exact
    tile hashes with its source even when the whole-frame phash
    diverges. Emits (image_id, tile_idx, tile_phash) long-form rows;
    images whose quadrants would fall under the 8×8 phash-grid floor
    emit nothing. Pixels never leave the
    stage; downstream bucketing groups by tile_phash, so the exchange
    carries three narrow columns."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, tidx, th = [], [], []
        for r in batch.select(["image_id", "bytes", "fmt"]).to_pylist():
            px = decode_image(r["bytes"], r["fmt"])
            h, w = px.shape[0], px.shape[1]
            if h < 16 or w < 16:  # quadrant must satisfy phash64's 8×8 floor
                continue
            hh, hw = h // 2, w // 2
            quads = (
                px[:hh, :hw], px[:hh, hw:], px[hh:, :hw], px[hh:, hw:],
            )
            for i, q in enumerate(quads):
                ids.append(r["image_id"])
                tidx.append(i)
                th.append(phash64(q))
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "tile_idx": pa.array(tidx, pa.int64()),
                "tile_phash": pa.array(th, pa.int64()),
            }
        )


class DecodeImageStats:
    """Actor stage: decode → per-image stats (no pixels in the output)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, widths, heights, means, stds, phashes, ok = [], [], [], [], [], [], []
        for r in batch.select(["image_id", "bytes", "fmt"]).to_pylist():
            ids.append(r["image_id"])
            try:
                px = decode_image(r["bytes"], r["fmt"])
                heights.append(px.shape[0])
                widths.append(px.shape[1])
                means.append(float(px.mean()))
                stds.append(float(px.std()))
                phashes.append(phash64(px))
                ok.append(True)
            except Exception:
                heights.append(None)
                widths.append(None)
                means.append(None)
                stds.append(None)
                phashes.append(None)
                ok.append(False)
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "mean_luma": pa.array(means, pa.float64()),
                "std_luma": pa.array(stds, pa.float64()),
                "phash_decoded": pa.array(phashes, pa.int64()),
                "decode_ok": pa.array(ok, pa.bool_()),
            }
        )


def resize_nearest(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (numpy)."""
    h, w, _ = px.shape
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    # contiguous output: numpy reductions differ by ulps on strided vs
    # contiguous input, so downstream bit-pinned moments (PairSSIM
    # cache vs replay) need one canonical layout — and an identity
    # resize must equal the original array bit-for-bit
    return np.ascontiguousarray(px[ys][:, xs])


class ResizeImages:
    """Actor stage: decode → resize → re-encode (PNG) at a fixed size.

    Output keeps the corpus schema shape (image_id, bytes, w, h, fmt) so
    it can be written back as a derived corpus.
    """

    def __init__(self, out_h: int = 64, out_w: int = 64):
        from ..functions.imagecodec import png_encode

        self.out_h, self.out_w = out_h, out_w
        self._encode = png_encode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, blobs = [], []
        for r in batch.select(["image_id", "bytes", "fmt"]).to_pylist():
            px = decode_image(r["bytes"], r["fmt"])
            small = resize_nearest(px, self.out_h, self.out_w)
            ids.append(r["image_id"])
            blobs.append(self._encode(np.ascontiguousarray(small)))
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "bytes": pa.array(blobs, pa.binary()),
                "w": pa.array([self.out_w] * len(ids), pa.int32()),
                "h": pa.array([self.out_h] * len(ids), pa.int32()),
                "fmt": pa.array(["png"] * len(ids), pa.string()),
            }
        )


def image_stats(corpus_ds: Dataset, concurrency: int = 4, batch_size: int = 64) -> Dataset:
    """Decode/feature pipeline over a corpus Dataset. Small batch_size:
    rows carry encoded image payloads (wide binary rows ⇒ small batches,
    SURVEY.md §4.2)."""
    return corpus_ds.map_batches(
        DecodeImageStats,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def resize_corpus(
    corpus_ds: Dataset, out_h: int = 64, out_w: int = 64, concurrency: int = 4, batch_size: int = 32
) -> Dataset:
    return corpus_ds.map_batches(
        ResizeImages,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"out_h": out_h, "out_w": out_w},
    )


AUDIO_FEATURE_SCHEMA = pa.schema(
    [
        ("audio_id", pa.string()),
        ("sample_rate", pa.int32()),
        ("duration_s", pa.float64()),
        ("rms", pa.float64()),
    ]
)

VIDEO_FRAME_SCHEMA = pa.schema(
    [
        ("video_id", pa.string()),
        ("frame_index", pa.int32()),
        ("frame_png", pa.binary()),
    ]
)


class DominantPalette:
    """Actor stage: decode → per-image dominant-color summary — the
    palette statistic a curation UI / near-dup triager keys on and a
    cheap color-space census for corpus balance.  Each image's pixels
    quantize to a 12-bit bin (4 bits/channel, ``(r>>4)<<8 |
    (g>>4)<<4 | (b>>4)``); one ``np.bincount`` per image yields the
    top-3 bins (ties break to the smaller bin id via a stable
    argsort on (−count, bin)), their pixel shares, and the Shannon
    entropy of the full 4096-bin color histogram (log2, summed in
    ascending-bin order — deterministic float fold).  Pixels never
    leave the stage; output is 8 narrow columns per image."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = []
        bins = [[], [], []]
        shares = [[], [], []]
        ent = []
        for r in batch.select(["image_id", "bytes", "fmt"]).to_pylist():
            px = decode_image(r["bytes"], r["fmt"]).astype(np.int64)
            q = (
                ((px[..., 0] >> 4) << 8)
                | ((px[..., 1] >> 4) << 4)
                | (px[..., 2] >> 4)
            ).ravel()
            counts = np.bincount(q, minlength=4096)
            n = q.size
            nz = np.flatnonzero(counts)
            order = nz[np.lexsort((nz, -counts[nz]))]
            ids.append(r["image_id"])
            for k in range(3):
                if k < len(order):
                    bins[k].append(int(order[k]))
                    shares[k].append(counts[order[k]] / n)
                else:
                    bins[k].append(None)
                    shares[k].append(None)
            p = counts[nz] / n
            ent.append(float(-(p * np.log2(p)).sum()))
        cols = {"image_id": pa.array(ids, pa.string())}
        for k in range(3):
            cols[f"bin{k + 1}"] = pa.array(bins[k], pa.int64())
            cols[f"share{k + 1}"] = pa.array(shares[k], pa.float64())
        cols["color_entropy"] = pa.array(ent, pa.float64())
        return pa.table(cols)


FEATURE_DIM = 14


def image_feature_vector(px: np.ndarray) -> np.ndarray:
    """Deterministic 14-dim visual descriptor from decoded pixels —
    per-channel mean/std (exact int64 moments → one float expression
    each), ITU-601 integer luma 8-bin histogram shares (coarse layout
    signature), and log2 aspect ratio. A stand-in for a real vision
    embedder with the same plumbing: per-image, layout-independent,
    fixed dimension."""
    h, w = px.shape[0], px.shape[1]
    n = h * w
    p = px.astype(np.int64)
    feats = np.empty(FEATURE_DIM, dtype=np.float64)
    for c in range(3):
        s = int(p[..., c].sum())
        s2 = int((p[..., c] * p[..., c]).sum())
        mean = s / n
        feats[c] = mean / 255.0
        feats[3 + c] = np.sqrt(max(s2 / n - mean * mean, 0.0)) / 255.0
    luma = (77 * p[..., 0] + 150 * p[..., 1] + 29 * p[..., 2]) >> 8
    hist = np.bincount((luma >> 5).ravel(), minlength=8)
    feats[6:13] = hist[:7] / n
    feats[13] = np.log2(w / h)
    return feats


class ImageFeatureVectors:
    """Actor stage: decode → fixed-dim feature vector per image (the
    embed step of a decode→embed→ANN multimodal pipeline). Pixels
    never leave the stage; output is (image_id, FEATURE_DIM float64
    list)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, vecs = [], []
        for r in batch.select(["image_id", "bytes", "fmt"]).to_pylist():
            px = decode_image(r["bytes"], r["fmt"])
            ids.append(r["image_id"])
            vecs.append(image_feature_vector(px))
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "feat": pa.array(
                    [v.tolist() for v in vecs], pa.list_(pa.float64(), FEATURE_DIM)
                ),
            }
        )


class AugmentImages:
    """Actor stage: decode → deterministic crop + flip ON REAL PIXELS →
    re-encode (the apply step of corpus_crop_plan's geometry; training
    pipelines re-run it identically because offsets are pure functions
    of the id). Crop window per the plan's FNV math; horizontal flip
    iff fnv ^ 'f' is odd. Output carries the re-encoded bytes plus the
    augmented phash — pixels stay inside the stage."""

    def __init__(self, crop: int = 16):
        self.crop = crop

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        from ..functions.imagecodec import encode_image, phash64

        ids, out_bytes, out_w, out_h, flips, phashes = [], [], [], [], [], []
        prime = np.uint64(1099511628211)
        for r in batch.select(["image_id", "bytes", "fmt"]).to_pylist():
            px = decode_image(r["bytes"], r["fmt"])
            h, w = px.shape[0], px.shape[1]
            if w < self.crop or h < self.crop:
                continue  # plan semantics: only fitting images augment
            base = np.uint64(14695981039346656037)
            with np.errstate(over="ignore"):
                for ch in r["image_id"].encode():
                    base = (base ^ np.uint64(ch)) * prime
                hx = (base ^ np.uint64(ord("x"))) * prime
                hy = (base ^ np.uint64(ord("y"))) * prime
                hf = (base ^ np.uint64(ord("f"))) * prime
            x0 = int(hx % np.uint64(w - self.crop + 1))
            y0 = int(hy % np.uint64(h - self.crop + 1))
            flip = bool(int(hf) & 1)
            cut = px[y0 : y0 + self.crop, x0 : x0 + self.crop]
            if flip:
                cut = cut[:, ::-1]
            cut = np.ascontiguousarray(cut)
            ids.append(r["image_id"])
            out_bytes.append(encode_image(cut, "png"))  # lossless out
            out_w.append(self.crop)
            out_h.append(self.crop)
            flips.append(flip)
            phashes.append(phash64(cut))
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "bytes": pa.array(out_bytes, pa.binary()),
                "w": pa.array(out_w, pa.int32()),
                "h": pa.array(out_h, pa.int32()),
                "flipped": pa.array(flips, pa.bool_()),
                "phash": pa.array(phashes, pa.int64()),
            }
        )


class MipPyramid:
    """Actor stage: decode → build the mip/thumbnail pyramid ON REAL
    PIXELS (corpus_mip_levels is the integer geometry PLAN; this is
    the apply step a thumbnail/LOD sink runs): each level halves both
    dimensions with an exact 2×2 integer box filter
    ((a+b+c+d)//4 per channel — pure integer floor mean, bit-stable
    across platforms; an odd trailing row/col is edge-dropped, the
    floor convention). Levels 1..max_level (or until a dimension
    would fall below 1). Output carries the losslessly re-encoded
    level bytes + dims + mean luma — source pixels never leave the
    stage; a downstream sink writes one partition per level."""

    def __init__(self, max_level: int = 3):
        self.max_level = max_level

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        from ..functions.imagecodec import encode_image

        ids, levels, ws, hs, out_bytes, lumas = [], [], [], [], [], []
        for r in batch.select(["image_id", "bytes", "fmt"]).to_pylist():
            px = decode_image(r["bytes"], r["fmt"])
            cur = px
            for lev in range(1, self.max_level + 1):
                h, w = cur.shape[0] & ~1, cur.shape[1] & ~1
                if h < 2 or w < 2:
                    break
                c = cur[:h, :w].astype(np.uint16)
                cur = (
                    (c[0::2, 0::2] + c[0::2, 1::2] + c[1::2, 0::2] + c[1::2, 1::2])
                    // 4
                ).astype(np.uint8)
                ids.append(r["image_id"])
                levels.append(lev)
                hs.append(cur.shape[0])
                ws.append(cur.shape[1])
                out_bytes.append(encode_image(cur, "png"))
                # integer-exact mean luma (BT.601 weights over int sums)
                s = cur.reshape(-1, cur.shape[2]).sum(axis=0, dtype=np.int64)
                n_px = cur.shape[0] * cur.shape[1]
                lumas.append(
                    float(299 * s[0] + 587 * s[1] + 114 * s[2]) / (1000.0 * n_px)
                )
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "level": pa.array(levels, pa.int32()),
                "w_l": pa.array(ws, pa.int32()),
                "h_l": pa.array(hs, pa.int32()),
                "bytes": pa.array(out_bytes, pa.binary()),
                "mean_luma": pa.array(lumas, pa.float64()),
            }
        )


class EqualizeImages:
    """Actor stage: decode → apply a BROADCAST global equalization LUT
    (level → stretched level, from corpus_luma_histogram's integer
    cdf) to every channel → lossless re-encode. The apply step of
    global histogram equalization: the LUT ships once via ``ray.put``
    (256 int64s), each image is one uint8 gather (LUT[px]) — the
    canonical broadcast-into-actor-pool shape with trivially small
    state. Pixels never leave the stage."""

    def __init__(self, lut_ref):
        self._ref = lut_ref
        self._lut = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        from ..functions.imagecodec import encode_image

        if self._lut is None:
            self._lut = ray.get(self._ref).astype(np.uint8)
        ids, out_bytes, ws, hs, mean_b, mean_a = [], [], [], [], [], []
        for r in batch.select(["image_id", "bytes", "fmt"]).to_pylist():
            px = decode_image(r["bytes"], r["fmt"])
            eq = self._lut[px]
            ids.append(r["image_id"])
            out_bytes.append(encode_image(eq, "png"))
            hs.append(eq.shape[0])
            ws.append(eq.shape[1])
            mean_b.append(float(px.mean()))
            mean_a.append(float(eq.mean()))
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "bytes": pa.array(out_bytes, pa.binary()),
                "w": pa.array(ws, pa.int32()),
                "h": pa.array(hs, pa.int32()),
                "mean_before": pa.array(mean_b, pa.float64()),
                "mean_after": pa.array(mean_a, pa.float64()),
            }
        )


class DecodeAudio:
    """STUB: audio codec libraries are not present in this container.

    The actor signature, batch flow and output schema
    (AUDIO_FEATURE_SCHEMA) are the real plumbing; the decode call is the
    single point to replace (e.g. soundfile/ffmpeg)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "audio decode requires an audio library not present in this "
            "environment; replace DecodeAudio.__call__'s decode with "
            "soundfile/ffmpeg and keep the schema"
        )


class SampleVideoFrames:
    """STUB: video demux/decoding requires ffmpeg (absent). See
    DecodeAudio for the substitution pattern; output schema is
    VIDEO_FRAME_SCHEMA (one row per sampled frame)."""

    def __init__(self, every_n_frames: int = 30):
        self.every = every_n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError("video decode requires ffmpeg (absent)")


class PairSSIM:
    """Actor stage: structural-similarity verification of near-dup IMAGE
    pairs. Input batches are (id_a, id_b) candidate pairs; the stage
    holds a ``ray.put`` ref of {image_id: (bytes, fmt)} covering ONLY
    ids that appear in a pair (candidate-sized — the corpus never
    broadcasts), decodes each image once per actor (LRU-less dict cache
    is fine: the working set IS the candidate set), nearest-resizes a
    mismatched pair to the elementwise-min dims, and appends a float64
    ``ssim`` column (functions.imagecodec.ssim_global). Pixels never
    leave the stage. At 100 TB the pair list and its image payload are
    output-sized (dedup candidates), so the lookup ships once per actor
    while the pair stream maps in parallel."""

    def __init__(self, lookup_ref):
        self._ref = lookup_ref
        self._lookup = None
        self._px = {}
        self._mom = {}  # (image_id, h, w) -> (centered luma, mu, var)

    def _pixels(self, image_id: str) -> np.ndarray:
        got = self._px.get(image_id)
        if got is None:
            data, fmt = self._lookup[image_id]
            got = decode_image(data, fmt)
            self._px[image_id] = got
        return got

    def _moments(self, image_id: str, px: np.ndarray):
        from ..functions.imagecodec import ssim_moments

        key = (image_id, px.shape[0], px.shape[1])
        got = self._mom.get(key)
        if got is None:
            got = ssim_moments(px)
            self._mom[key] = got
        return got

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        from ..functions.imagecodec import ssim_from_moments

        if self._lookup is None:
            self._lookup = ray.get(self._ref)
        scores = []
        for a, b in zip(
            batch.column("id_a").to_pylist(), batch.column("id_b").to_pylist()
        ):
            pxa = self._pixels(a)
            pxb = self._pixels(b)
            if pxa.shape[:2] != pxb.shape[:2]:
                h = min(pxa.shape[0], pxb.shape[0])
                w = min(pxa.shape[1], pxb.shape[1])
                pxa = resize_nearest(pxa, h, w)
                pxb = resize_nearest(pxb, h, w)
            # per-image moments computed once per actor (decode-cache
            # sibling); the pair pays only its covariance — values are
            # bit-identical to ssim_global on the same pixel pair
            da, mu_a, va = self._moments(a, pxa)
            db, mu_b, vb = self._moments(b, pxb)
            cov = float((da * db).mean())
            scores.append(ssim_from_moments(mu_a, mu_b, va, vb, cov))
        return batch.append_column("ssim", pa.array(scores, pa.float64()))


class PairSSIMInline:
    """Join-decorated variant of ``PairSSIM`` — the above-gate path
    where each pair row carries BOTH images' bytes (pair ⋈ corpus on
    id_a then id_b) instead of a driver-collected candidate lookup
    shipped via ``ray.put``: no process ever holds O(candidates) image
    bytes, the pixels ride the (output-sized) pair shuffle. Decode and
    moment caches stay per-actor — near-dup candidates repeat ids
    heavily across pairs — and the SSIM math is byte-identical to
    ``PairSSIM`` (same moment cache keying, same covariance fold).
    Input batches: (id_a, id_b, hamming, bytes_a, fmt_a, bytes_b,
    fmt_b); output drops the byte columns."""

    def __init__(self):
        self._px = {}
        self._mom = {}

    def _pixels(self, image_id: str, data: bytes, fmt: str) -> np.ndarray:
        got = self._px.get(image_id)
        if got is None:
            got = decode_image(data, fmt)
            self._px[image_id] = got
        return got

    def _moments(self, image_id: str, px: np.ndarray):
        from ..functions.imagecodec import ssim_moments

        key = (image_id, px.shape[0], px.shape[1])
        got = self._mom.get(key)
        if got is None:
            got = ssim_moments(px)
            self._mom[key] = got
        return got

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.imagecodec import ssim_from_moments

        scores = []
        for a, b, ba, fa, bb, fb in zip(
            batch.column("id_a").to_pylist(),
            batch.column("id_b").to_pylist(),
            batch.column("bytes_a").to_pylist(),
            batch.column("fmt_a").to_pylist(),
            batch.column("bytes_b").to_pylist(),
            batch.column("fmt_b").to_pylist(),
        ):
            pxa = self._pixels(a, ba, fa)
            pxb = self._pixels(b, bb, fb)
            if pxa.shape[:2] != pxb.shape[:2]:
                h = min(pxa.shape[0], pxb.shape[0])
                w = min(pxa.shape[1], pxb.shape[1])
                pxa = resize_nearest(pxa, h, w)
                pxb = resize_nearest(pxb, h, w)
            da, mu_a, va = self._moments(a, pxa)
            db, mu_b, vb = self._moments(b, pxb)
            cov = float((da * db).mean())
            scores.append(ssim_from_moments(mu_a, mu_b, va, vb, cov))
        return pa.table(
            {
                "id_a": batch.column("id_a"),
                "id_b": batch.column("id_b"),
                "hamming": batch.column("hamming"),
                "ssim": pa.array(scores, pa.float64()),
            }
        )
