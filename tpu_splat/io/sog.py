"""SOG v2 compressed-splat format: export + import.

Reference: src/core/sogs.cpp (writer, schema in SURVEY.md §8.2) and
src/loader/formats/sogs.cpp (reader). Layout (meta.json + WebP planes, zipped when the
output path ends in .sog):

  * gaussians Morton-reordered (kernels/morton_encoding.cu) into width x height RGBA planes,
    width = ceil(sqrt(n)/4)*4 (sogs.cpp:348);
  * means: per-axis signed log transform copysign(log(1+|v|), v) (sogs.cpp:55-57),
    normalized to [0,1] by min/max, 16-bit split into means_l/means_u planes;
  * quats: normalized, largest-component dropped, remaining three packed *sqrt(2) into
    8 bits, alpha = 252+largest_idx (sogs.cpp:60-143);
  * scales / sh0: 1-d k-means(256) over all 3 channels jointly, labels in RGB planes,
    codebook in meta.json; sh0 alpha channel stores 255*sigmoid(opacity) (sogs.cpp:505-580);
  * shN: vector k-means into a palette (<= 64*1024 entries), then a second 1-d k-means(256)
    over centroid values as codebook; centroids plane is band-major 64-wide, labels plane
    stores the 16-bit palette index (sogs.cpp:620-718).

TPU-native: k-means runs in JAX (assignment is one [N,D]x[D,K] MXU matmul per iteration,
replacing kernels/kmeans.cu); Morton codes are numpy bit tricks (morton_encoding.cu:21-100).
"""

from __future__ import annotations

import io
import json
import zipfile
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


# ----------------------------------------------------------------------- morton ordering


def morton_encode(positions: np.ndarray) -> np.ndarray:
    """63-bit Morton codes from 21-bit-quantized positions (morton_encoding.cu:21-100)."""
    pts = np.asarray(positions, np.float64)
    mins = pts.min(axis=0)
    maxs = pts.max(axis=0)
    q = ((pts - mins) / np.maximum(maxs - mins, 1e-12) * ((1 << 21) - 1)).astype(np.uint64)

    def split_by_3(a: np.ndarray) -> np.ndarray:
        x = a & np.uint64(0x1FFFFF)
        x = (x | (x << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
        x = (x | (x << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
        x = (x | (x << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
        x = (x | (x << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
        x = (x | (x << np.uint64(2))) & np.uint64(0x1249249249249249)
        return x

    return (
        split_by_3(q[:, 0])
        | (split_by_3(q[:, 1]) << np.uint64(1))
        | (split_by_3(q[:, 2]) << np.uint64(2))
    )


def morton_order(positions: np.ndarray) -> np.ndarray:
    return np.argsort(morton_encode(positions), kind="stable")


# ------------------------------------------------------------------------------- k-means


def kmeans(data: np.ndarray, k: int, iterations: int = 10, seed: int = 0):
    """Lloyd k-means on TPU: assignment = one MXU matmul per iteration
    (replaces gs::cuda::kmeans, kernels/kmeans.cu:162). Returns (centroids [k,D], labels)."""
    data = np.asarray(data, np.float32)
    x = jnp.asarray(data)
    n, d = x.shape
    k = min(k, n)
    rng = np.random.default_rng(seed)
    # k-means++ init on a subsample (random init leaves empty/duplicated clusters)
    sub = data[rng.choice(n, min(n, 1 << 16), replace=False)]
    centers = [sub[rng.integers(len(sub))]]
    d2 = np.sum((sub - centers[0]) ** 2, axis=1)
    for _ in range(k - 1):
        probs = d2 / max(d2.sum(), 1e-12)
        nxt = sub[rng.choice(len(sub), p=probs)]
        centers.append(nxt)
        d2 = np.minimum(d2, np.sum((sub - nxt) ** 2, axis=1))
    init = jnp.asarray(np.stack(centers))

    @jax.jit
    def step(cent):
        # argmin ||x - c||^2 = argmax (x @ c.T - 0.5 ||c||^2)
        score = x @ cent.T - 0.5 * jnp.sum(cent * cent, axis=1)[None, :]
        labels = jnp.argmax(score, axis=1)
        sums = jnp.zeros((k, d), jnp.float32).at[labels].add(x)
        cnts = jnp.zeros((k,), jnp.float32).at[labels].add(1.0)
        new_cent = jnp.where(cnts[:, None] > 0, sums / jnp.maximum(cnts, 1.0)[:, None], cent)
        return new_cent, labels

    cent = init
    labels = None
    for _ in range(max(iterations, 1)):
        cent, labels = step(cent)
    return np.asarray(cent), np.asarray(labels, np.int32)


def kmeans_1d(data: np.ndarray, k: int = 256, iterations: int = 10, seed: int = 0):
    """1-d k-means (kernels/kmeans.cu:226): sorted-quantile init + Lloyd."""
    v = np.asarray(data, np.float32).reshape(-1)
    k = min(k, v.size)
    init = np.quantile(v, np.linspace(0, 1, k)).astype(np.float32)
    x = jnp.asarray(v)
    cent = jnp.asarray(init)

    @jax.jit
    def step(c):
        c_sorted = jnp.sort(c)
        edges = 0.5 * (c_sorted[1:] + c_sorted[:-1])
        labels = jnp.searchsorted(edges, x)
        sums = jnp.zeros((k,), jnp.float32).at[labels].add(x)
        cnts = jnp.zeros((k,), jnp.float32).at[labels].add(1.0)
        return jnp.where(cnts > 0, sums / jnp.maximum(cnts, 1.0), c_sorted), labels

    labels = None
    for _ in range(max(iterations, 1)):
        cent, labels = step(cent)
    return np.asarray(cent), np.asarray(labels, np.int32)


# ------------------------------------------------------------------------ quat pack/unpack


def log_transform(v: np.ndarray) -> np.ndarray:
    return np.copysign(np.log(np.abs(v) + 1.0), v)


def inv_log_transform(v: np.ndarray) -> np.ndarray:
    return np.copysign(np.exp(np.abs(v)) - 1.0, v)


def pack_quaternions(q: np.ndarray) -> np.ndarray:
    """[N,4] wxyz -> [N,4] uint8 smallest-three encoding (sogs.cpp:60-143)."""
    q = np.asarray(q, np.float32)
    norm = np.linalg.norm(q, axis=1, keepdims=True)
    qn = np.where(norm > 0, q / np.maximum(norm, 1e-12), [[1, 0, 0, 0]])
    max_idx = np.argmax(np.abs(qn), axis=1)
    sign = np.sign(np.take_along_axis(qn, max_idx[:, None], axis=1))
    sign = np.where(sign == 0, 1.0, sign)
    qn = qn * sign  # largest component positive
    qs = qn * np.sqrt(2.0, dtype=np.float32)

    out = np.empty((q.shape[0], 4), np.uint8)
    cols = np.array([[1, 2, 3], [0, 2, 3], [0, 1, 3], [0, 1, 2]])[max_idx]  # [N,3]
    rest = np.take_along_axis(qs, cols, axis=1)
    out[:, :3] = np.clip((rest * 0.5 + 0.5) * 255.0, 0, 255).astype(np.uint8)
    out[:, 3] = (252 + max_idx).astype(np.uint8)
    return out


def unpack_quaternions(packed: np.ndarray) -> np.ndarray:
    """Inverse of pack_quaternions -> [N,4] wxyz normalized."""
    packed = np.asarray(packed)
    max_idx = packed[:, 3].astype(np.int32) - 252
    rest = (packed[:, :3].astype(np.float32) / 255.0 - 0.5) * 2.0 / np.sqrt(2.0)
    missing = np.sqrt(np.maximum(1.0 - np.sum(rest * rest, axis=1), 0.0))
    q = np.empty((packed.shape[0], 4), np.float32)
    cols = np.array([[1, 2, 3], [0, 2, 3], [0, 1, 3], [0, 1, 2]])[max_idx]
    np.put_along_axis(q, cols, rest, axis=1)
    np.put_along_axis(q, max_idx[:, None], missing[:, None], axis=1)
    return q


# --------------------------------------------------------------------------- webp helpers


def _to_plane(values_rgba: np.ndarray, width: int, height: int) -> np.ndarray:
    """[N,4] uint8 -> [H,W,4] plane, identity layout, padding 255."""
    plane = np.full((width * height, 4), 255, np.uint8)
    plane[: values_rgba.shape[0]] = values_rgba
    return plane.reshape(height, width, 4)


def _write_webp(buf_or_path, plane: np.ndarray) -> bytes:
    from PIL import Image

    img = Image.fromarray(plane, "RGBA")
    bio = io.BytesIO()
    img.save(bio, format="WEBP", lossless=True, quality=100)
    return bio.getvalue()


def _read_webp(data: bytes) -> np.ndarray:
    from PIL import Image

    img = Image.open(io.BytesIO(data)).convert("RGBA")
    return np.asarray(img)


# -------------------------------------------------------------------------------- writer


def save_sog(path: str | Path, arrays: dict, kmeans_iterations: int = 10) -> None:
    """Write a .sog zip (or a directory of files when `path` has no .sog suffix).

    arrays: means [N,3], sh0 [N,1,3], shN [N,K-1,3], scaling_raw [N,3] (log),
    rotation_raw [N,4] (unnormalized wxyz), opacity_raw [N,1] (logit).
    """
    path = Path(path)
    means = np.asarray(arrays["means"], np.float32)
    n = means.shape[0]
    order = morton_order(means)  # sogs.cpp:378

    width = int(np.ceil(np.sqrt(n) / 4.0)) * 4
    height = int(np.ceil(n / width))

    files: dict[str, bytes] = {}
    meta: dict = {"version": 2, "count": int(n), "width": width, "height": height}

    # means: log transform -> minmax-normalize -> 16-bit split
    mlog = log_transform(means)
    mins = mlog.min(axis=0)
    maxs = mlog.max(axis=0)
    mnorm = np.clip((mlog[order] - mins) / (maxs - mins + 1e-10), 0, 1)
    m16 = (mnorm * 65535.0).astype(np.uint16)
    lo = np.full((n, 4), 255, np.uint8)
    hi = np.full((n, 4), 255, np.uint8)
    lo[:, :3] = (m16 & 0xFF).astype(np.uint8)
    hi[:, :3] = (m16 >> 8).astype(np.uint8)
    files["means_l.webp"] = _write_webp(None, _to_plane(lo, width, height))
    files["means_u.webp"] = _write_webp(None, _to_plane(hi, width, height))
    meta["means"] = {
        "mins": [float(v) for v in mins],
        "maxs": [float(v) for v in maxs],
        "files": ["means_l.webp", "means_u.webp"],
    }

    # quats
    files["quats.webp"] = _write_webp(
        None, _to_plane(pack_quaternions(np.asarray(arrays["rotation_raw"])[order]), width, height)
    )
    meta["quats"] = {"files": ["quats.webp"]}

    # scales: joint 1-d k-means(256) over all channels (column-major, sogs.cpp:513-520)
    scales = np.asarray(arrays["scaling_raw"], np.float32)
    sc_flat = scales.T.reshape(-1)  # column-major: all x, then y, then z
    sc_cent, sc_labels = kmeans_1d(sc_flat, 256, kmeans_iterations)
    sc_lab3 = sc_labels.reshape(3, n).T[order]  # [N,3]
    plane = np.full((n, 4), 255, np.uint8)
    plane[:, :3] = sc_lab3.astype(np.uint8)
    files["scales.webp"] = _write_webp(None, _to_plane(plane, width, height))
    meta["scales"] = {"codebook": [float(v) for v in sc_cent], "files": ["scales.webp"]}

    # sh0 (+opacity in alpha)
    sh0 = np.asarray(arrays["sh0"], np.float32).reshape(n, 3)
    c_cent, c_labels = kmeans_1d(sh0.T.reshape(-1), 256, kmeans_iterations)
    c_lab3 = c_labels.reshape(3, n).T[order]
    opac = 1.0 / (1.0 + np.exp(-np.asarray(arrays["opacity_raw"], np.float32).reshape(n)))
    plane = np.zeros((n, 4), np.uint8)
    plane[:, :3] = c_lab3.astype(np.uint8)
    plane[:, 3] = np.clip(255.0 * opac[order], 0, 255).astype(np.uint8)
    files["sh0.webp"] = _write_webp(None, _to_plane(plane, width, height))
    meta["sh0"] = {"codebook": [float(v) for v in c_cent], "files": ["sh0.webp"]}

    # shN: vector k-means palette + 1-d codebook of centroid values (sogs.cpp:620-718)
    shN = np.asarray(arrays.get("shN"), np.float32) if arrays.get("shN") is not None else None
    if shN is not None and shN.size > 0 and shN.shape[1] > 0:
        coeffs = shN.shape[1]
        flat = shN.reshape(n, coeffs * 3)
        # min(64, max(1, 2^floor(log2(n/1024)))) * 1024 — the PlayCanvas splat-transform
        # sizing the reference mirrors (its C++ parenthesization at sogs.cpp:631 collapses
        # to a constant 64; we keep the ecosystem-intended palette)
        pow2 = int(2 ** np.floor(np.log2(n / 1024.0))) if n >= 1024 else 1
        palette_size = min(min(64, max(1, pow2)) * 1024, n)
        cents, labels = kmeans(flat, palette_size, kmeans_iterations)
        actual = cents.shape[0]
        cb_cent, cb_labels = kmeans_1d(cents.reshape(-1), 256, kmeans_iterations)

        cw = 64 * coeffs
        ch = (actual + 63) // 64
        cbuf = np.full((cw * ch, 4), 255, np.uint8)
        cb_lab = cb_labels.reshape(actual, coeffs * 3)
        for c in range(3):
            # band-major: channel c of coefficient j lives at column j + c*coeffs
            vals = cb_lab[:, c * coeffs : (c + 1) * coeffs]  # [actual, coeffs]
            idx = np.arange(actual)[:, None] * coeffs + np.arange(coeffs)[None, :]
            cbuf[idx.reshape(-1), c] = vals.reshape(-1).astype(np.uint8)
        files["shN_centroids.webp"] = _write_webp(None, cbuf.reshape(ch, cw, 4))

        lab = labels[order]
        lbuf = np.full((n, 4), 255, np.uint8)
        lbuf[:, 0] = (lab & 0xFF).astype(np.uint8)
        lbuf[:, 1] = ((lab >> 8) & 0xFF).astype(np.uint8)
        lbuf[:, 2] = 0
        files["shN_labels.webp"] = _write_webp(None, _to_plane(lbuf, width, height))

        degree = {3: 1, 8: 2, 15: 3, 24: 4}.get(coeffs, 3)
        meta["shN"] = {
            "codebook": [float(v) for v in cb_cent],
            "palette_size": int(actual),
            "bands": degree,
            "coeffs": int(coeffs),
            "files": ["shN_centroids.webp", "shN_labels.webp"],
        }

    meta_bytes = json.dumps(meta, indent=1).encode()
    if path.suffix == ".sog":
        path.parent.mkdir(parents=True, exist_ok=True)
        with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as z:
            z.writestr("meta.json", meta_bytes)
            for name, data in files.items():
                z.writestr(name, data)
    else:
        path.mkdir(parents=True, exist_ok=True)
        (path / "meta.json").write_bytes(meta_bytes)
        for name, data in files.items():
            (path / name).write_bytes(data)


# -------------------------------------------------------------------------------- reader


def load_sog(path: str | Path) -> dict:
    """Read .sog zip or meta.json directory -> raw parameter dict
    (loader: src/loader/formats/sogs.cpp:102-530)."""
    path = Path(path)
    if path.is_file() and path.suffix == ".sog":
        with zipfile.ZipFile(path) as z:
            blobs = {name: z.read(name) for name in z.namelist()}
    else:
        root = path if path.is_dir() else path.parent
        blobs = {p.name: p.read_bytes() for p in root.iterdir() if p.is_file()}
    meta = json.loads(blobs["meta.json"])
    n = meta["count"]
    width = meta["width"]

    def plane(name):
        return _read_webp(blobs[name]).reshape(-1, 4)[:n]

    lo = plane(meta["means"]["files"][0]).astype(np.uint16)
    hi = plane(meta["means"]["files"][1]).astype(np.uint16)
    m16 = (lo[:, :3] | (hi[:, :3] << 8)).astype(np.float32) / 65535.0
    mins = np.asarray(meta["means"]["mins"], np.float32)
    maxs = np.asarray(meta["means"]["maxs"], np.float32)
    means = inv_log_transform(m16 * (maxs - mins) + mins)

    quats = unpack_quaternions(plane(meta["quats"]["files"][0]))

    sc_cb = np.asarray(meta["scales"]["codebook"], np.float32)
    sc = plane(meta["scales"]["files"][0])[:, :3].astype(np.int32)
    scaling_raw = sc_cb[np.clip(sc, 0, len(sc_cb) - 1)]

    c_cb = np.asarray(meta["sh0"]["codebook"], np.float32)
    sh0p = plane(meta["sh0"]["files"][0])
    sh0 = c_cb[np.clip(sh0p[:, :3].astype(np.int32), 0, len(c_cb) - 1)][:, None, :]
    op = np.clip(sh0p[:, 3].astype(np.float32) / 255.0, 1e-6, 1 - 1e-6)
    opacity_raw = np.log(op / (1.0 - op))[:, None]

    if "shN" in meta:
        coeffs = meta["shN"]["coeffs"]
        actual = meta["shN"]["palette_size"]
        cb = np.asarray(meta["shN"]["codebook"], np.float32)
        cplane = _read_webp(blobs[meta["shN"]["files"][0]]).reshape(-1, 4)
        cb_lab = np.zeros((actual, coeffs * 3), np.int32)
        idx = np.arange(actual)[:, None] * coeffs + np.arange(coeffs)[None, :]
        for c in range(3):
            cb_lab[:, c * coeffs : (c + 1) * coeffs] = cplane[idx.reshape(-1), c].reshape(
                actual, coeffs
            )
        cents = cb[np.clip(cb_lab, 0, len(cb) - 1)]
        lp = plane(meta["shN"]["files"][1])
        labels = lp[:, 0].astype(np.int32) | (lp[:, 1].astype(np.int32) << 8)
        # the flat coefficient index is row-major over [coeffs, 3] (writer `flat` layout),
        # so a plain reshape restores [N, coeffs, 3]
        shN = cents[np.clip(labels, 0, actual - 1)].reshape(n, coeffs, 3)
    else:
        shN = np.zeros((n, 0, 3), np.float32)

    return {
        "means": means.astype(np.float32),
        "sh0": sh0.astype(np.float32),
        "shN": shN.astype(np.float32),
        "scaling_raw": scaling_raw.astype(np.float32),
        "rotation_raw": quats.astype(np.float32),
        "opacity_raw": opacity_raw.astype(np.float32),
    }
