"""Exact-KNN patch-exemplar SR demo.

Reference analog: dlib/diagnosis/knn_demo_patches.py — builds a
dictionary mapping every distinct LR sz x sz patch seen in training to
the empirical distribution of the HR 2x2 atoms it co-occurs with
(build_mapping, :579), then reconstructs test images by nearest-
neighbour lookup over the dictionary with a ring-weighted L1 distance
(get_ring :909, argKmin :989) and categorical sampling of the HR atom,
folding the sampled 2x2 atoms back into an image. The study quantifies
how far pure patch recurrence (no learned model) gets on this data.

TPU-native rebuild: the pykeops LazyTensor argKmin (a JIT-compiled C++
reduction) becomes a CHUNKED exact pairwise |q - d| . ring contraction
in jnp with lax.top_k — a few thousand dictionary atoms need no
approximate backend; the dictionary build is a vectorized np.unique
group-by instead of a Python hash loop.
"""
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def ring_weights(sz: int, c: float = 300.0) -> np.ndarray:
    """Concentric weighting of the reference get_ring: ring k (from
    the border) weighs k+1, except the center ring which weighs
    ceil(sz/2)*c — the center pixel dominates the distance."""
    assert sz % 2 == 1, sz
    if sz == 1:
        return np.ones((1, 1), np.float32)
    z = (sz + 1) // 2
    p = [(i + 1) * (c if i == z - 1 else 1.0) for i in range(z)]
    p = p[::-1]                        # center first
    a = np.full((1, 1), p[0], np.float32)
    for v in p[1:]:
        a = np.pad(a, 1, constant_values=v)
    return a


def extract_pairs(l_img: np.ndarray, h_img: np.ndarray, sz: int
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """(LR patch, HR atom) training pairs: every sz x sz LR window
    (reflect-padded so each window centers one LR pixel) paired with
    the 2x2 HR block that pixel maps to at x2. Returns
    (N, sz*sz) uint8 and (N, 4) uint8."""
    assert l_img.ndim == 2 and h_img.ndim == 2
    hh, ww = l_img.shape
    assert h_img.shape == (2 * hh, 2 * ww), (l_img.shape, h_img.shape)
    p = sz // 2
    lp = np.pad(l_img, p, mode='reflect')
    lw = np.lib.stride_tricks.sliding_window_view(lp, (sz, sz))
    lw = lw.reshape(hh * ww, sz * sz)
    hp = h_img.reshape(hh, 2, ww, 2).transpose(0, 2, 1, 3)
    hp = hp.reshape(hh * ww, 4)
    return np.ascontiguousarray(lw), np.ascontiguousarray(hp)


def build_dict(pairs: List[Tuple[np.ndarray, np.ndarray]], sz: int
               ) -> Dict[str, np.ndarray]:
    """Group all training (LR patch, HR atom) pairs by distinct LR
    patch. Returns padded arrays:
      atoms_l (M, sz*sz) f32, atoms_h (M, A, 4) f32,
      probs (M, A) f32 (zero-padded empirical distribution),
      n (M,) int32 atoms per entry."""
    lw = np.concatenate([p[0] for p in pairs], 0)
    hp = np.concatenate([p[1] for p in pairs], 0)
    uniq_l, inv = np.unique(lw, axis=0, return_inverse=True)
    # group (l index, h atom) and count co-occurrences
    key = np.concatenate([inv[:, None].astype(np.uint32).view(np.uint8)
                          .reshape(len(inv), -1), hp], 1)
    uk, counts = np.unique(key, axis=0, return_counts=True)
    li = uk[:, :4].copy().view(np.uint32).reshape(-1).astype(np.int64)
    ha = uk[:, 4:]
    order = np.argsort(li, kind='stable')
    li, ha, counts = li[order], ha[order], counts[order]
    m = len(uniq_l)
    n_per = np.bincount(li, minlength=m)
    a_max = int(n_per.max())
    atoms_h = np.zeros((m, a_max, 4), np.float32)
    probs = np.zeros((m, a_max), np.float32)
    starts = np.concatenate([[0], np.cumsum(n_per)[:-1]])
    for i in range(m):
        s, n = starts[i], n_per[i]
        atoms_h[i, :n] = ha[s:s + n]
        probs[i, :n] = counts[s:s + n] / counts[s:s + n].sum()
    return {'atoms_l': uniq_l.astype(np.float32), 'atoms_h': atoms_h,
            'probs': probs, 'n': n_per.astype(np.int32), 'sz': sz}


def chunked_knn(queries, atoms_l, ring, k: int = 1,
                chunk: int = 2048):
    """Exact ring-weighted-L1 k-NN: (n, f) queries over (M, f)
    dictionary rows, jit-compiled in fixed-size chunks (one compile,
    padded tail). Returns (n, k) neighbour indices. Shared by
    knn_restore and patch_dict's knn fallback."""
    q = jnp.asarray(queries, jnp.float32)
    d = jnp.asarray(atoms_l)
    ring = jnp.asarray(ring)

    @jax.jit
    def topk_chunk(qc):
        dist = jnp.sum(jnp.abs(qc[:, None, :] - d[None]) * ring, -1)
        _, idx = jax.lax.top_k(-dist, k)              # (chunk, k)
        return idx

    n = q.shape[0]
    pad = (-n) % chunk
    qp = jnp.pad(q, ((0, pad), (0, 0)))
    idxs = [topk_chunk(qp[i:i + chunk]) for i in range(0, n + pad,
                                                       chunk)]
    return jnp.concatenate(idxs, 0)[:n]               # (n, k)


def knn_restore(l_img: np.ndarray, dictionary: Dict, k: int = 1,
                seed: int = 0, chunk: int = 2048,
                ring_c: float = 300.0) -> np.ndarray:
    """Reconstruct the x2 HR image of `l_img` by exact k-NN over the
    dictionary (ring-weighted L1), sampling one HR atom per pixel from
    the matched entry's empirical distribution (k>1: a uniformly
    chosen neighbour's distribution). Returns uint8 (2h, 2w)."""
    sz = dictionary['sz']
    queries, _ = extract_pairs(l_img, np.zeros(
        (2 * l_img.shape[0], 2 * l_img.shape[1]), l_img.dtype), sz)
    probs = jnp.asarray(dictionary['probs'])          # (M, A)
    atoms_h = jnp.asarray(dictionary['atoms_h'])      # (M, A, 4)
    n = queries.shape[0]
    nbr = chunked_knn(queries, dictionary['atoms_l'],
                      ring_weights(sz, ring_c).reshape(-1), k=k,
                      chunk=chunk)                    # (n, k)
    key = jax.random.key(seed)
    kq, ks = jax.random.split(key)
    pick = jax.random.randint(kq, (n,), 0, k)
    ent = jnp.take_along_axis(nbr, pick[:, None], 1)[:, 0]   # (n,)
    logp = jnp.log(jnp.maximum(probs[ent], 1e-30))
    a_i = jax.random.categorical(ks, logp, axis=-1)   # (n,)
    atoms = atoms_h[ent, a_i]                         # (n, 4)
    hh, ww = l_img.shape
    out = np.asarray(atoms).reshape(hh, ww, 2, 2).transpose(
        0, 2, 1, 3).reshape(2 * hh, 2 * ww)
    return np.clip(out, 0, 255).astype(np.uint8)


def run_knn_demo(data_root: str, splits_root: str, train_ds: str,
                 test_ds: str, out_dir: str, sz_l: int = 3,
                 kn: int = 1, n_train: Optional[int] = None,
                 n_test: int = 2, seed: int = 0) -> Dict:
    """Full demo matching the reference flow: build the dictionary
    from the train fold, knn-restore test images, and emit the
    comparison figure (GT / bicubic / knn) + a summary dict
    {dict_size, avg_atoms, psnr_knn, psnr_bicubic}."""
    from srcaco2_tpu.data import folds, io as dio
    from srcaco2_tpu.data.dataset import ds_dir
    from srcaco2_tpu.diagnosis.visualize import restore_grid
    from srcaco2_tpu.ops import metrics as M

    os.makedirs(out_dir, exist_ok=True)
    data_root = os.path.join(data_root, ds_dir(train_ds))
    pairs_lh, _ = folds.get_pairs(splits_root, train_ds)
    if n_train:
        pairs_lh = pairs_lh[:n_train]
    train_pairs = []
    for l_rel, h_rel in pairs_lh:
        li = dio.imread_uint(os.path.join(data_root, l_rel), 1)[..., 0]
        hi = dio.imread_uint(os.path.join(data_root, h_rel), 1)[..., 0]
        if hi.shape[0] != 2 * li.shape[0]:
            continue                       # demo is defined for x2
        train_pairs.append(extract_pairs(li, hi, sz_l))
    assert train_pairs, 'no x2 train pairs found'
    dictionary = build_dict(train_pairs, sz_l)

    test_lh, _ = folds.get_pairs(splits_root, test_ds)
    psnrs_knn, psnrs_bi = [], []
    for i, (l_rel, h_rel) in enumerate(test_lh[:n_test]):
        li = dio.imread_uint(os.path.join(data_root, l_rel), 1)[..., 0]
        hi = dio.imread_uint(os.path.join(data_root, h_rel), 1)[..., 0]
        if hi.shape[0] != 2 * li.shape[0]:
            continue
        rec = knn_restore(li, dictionary, k=kn, seed=seed + i)
        bic = dio.cv2_resize_cubic_uint8(
            li, (hi.shape[1], hi.shape[0]))[..., 0]

        def psnr(a):
            e = jnp.asarray(a, jnp.float32)[None, None]
            h = jnp.asarray(hi, jnp.float32)[None, None]
            return float(M.mb_psnr(e, h, border=2)[0])
        psnrs_knn.append(psnr(rec))
        psnrs_bi.append(psnr(bic))
        restore_grid(
            [bic.astype(np.float32), rec.astype(np.float32)],
            [f'bicubic ({psnrs_bi[-1]:.2f} dB)',
             f'knn-{kn} {sz_l}x{sz_l} ({psnrs_knn[-1]:.2f} dB)'],
            hi.astype(np.float32),
            os.path.join(out_dir, f'knn_demo_{i}.png'))
    summary = {
        'dict_size': int(len(dictionary['atoms_l'])),
        'avg_atoms_per_entry': float(dictionary['n'].mean()),
        'sz_l': sz_l, 'kn': kn,
        'psnr_knn': float(np.mean(psnrs_knn)) if psnrs_knn else None,
        'psnr_bicubic': float(np.mean(psnrs_bi)) if psnrs_bi else None,
    }
    with open(os.path.join(out_dir, 'log.txt'), 'w') as f:
        f.write(repr(summary) + '\n')
    return summary
