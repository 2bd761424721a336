"""Named reference loss zoo — 1:1 equivalents of the experimental losses in
`/root/reference/core/mylib.py:310-1540` (loss_func1…, FLoss, SAMLoss),
golden-pinned against the torch originals (tests/golden/loss_zoo.npz).

None of these are on the reference's active path (only l1/l2/smooth_l1 are,
`diffusion_general.py:76-84`); they ship for capability parity. The
composable building blocks live in train/losses.py; this module reproduces
the reference's exact *combinations*, including its quirks:

  * `sobel_gradient:253` — per-channel Sobel correlation, zero padding;
  * `Gaussian_Blur:292` — cv2.GaussianBlur(ksize=5, σ=2), reflect-101
    border (NOT the zero-padded blur in utils/image_ops.py);
  * `dwt:1044` — the MWCNN *unnormalised* Haar butterfly (sum, not /2);
  * `SAMLoss:1024` — reshape semantics follow torch NCHW flattening;
  * `FLoss:817` — Barlow-Twins cross-correlation with double batch norm.

All image arguments are channels-last (B, H, W, C); feature arguments keep
their native shapes. Pure jnp, jit/grad-safe.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from tmdiff_tpu.utils.image_ops import filter2d, SOBEL_X, SOBEL_Y

_CV2_GAUSS_5_2 = None


def _cv2_gauss_kernel():
    """cv2.getGaussianKernel(5, 2): exp(−x²/2σ²) at x=−2..2, normalised."""
    global _CV2_GAUSS_5_2
    if _CV2_GAUSS_5_2 is None:
        g = jnp.exp(-jnp.arange(-2.0, 3.0) ** 2 / (2.0 * 2.0**2))
        g = g / g.sum()
        _CV2_GAUSS_5_2 = jnp.outer(g, g)
    return _CV2_GAUSS_5_2


def gaussian_blur_cv(x):
    """`Gaussian_Blur` (mylib:292): cv2.GaussianBlur((5,5), 2) with the
    default BORDER_REFLECT_101 — jnp.pad mode="reflect"."""
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
    return filter2d(xp, _cv2_gauss_kernel(), padding="VALID")


def sobel_pair(x):
    return filter2d(x, SOBEL_X), filter2d(x, SOBEL_Y)


def _l1(a, b):
    return jnp.mean(jnp.abs(a - b))


def _pan_gradient_term(pan, out):
    """L1 gradient match of channel-mean(out) against PAN — shared by
    loss_func1/2/3/8/9."""
    out2pan = jnp.mean(out, axis=-1, keepdims=True)
    px, py = sobel_pair(pan)
    ox, oy = sobel_pair(out2pan)
    return _l1(ox, px) + _l1(oy, py)


def loss_func1(ref, pan, ms, out):
    """mylib:310-336: L1(out, ms) + L1(out, ref) + PAN-gradient match."""
    return _l1(out, ms) + _l1(out, ref) + _pan_gradient_term(pan, out)


def loss_func2(ref, pan, ms, out):
    """mylib:341-368: spectral term through the cv2 Gaussian blur."""
    return (
        _l1(gaussian_blur_cv(out), ms)
        + _l1(out, ref)
        + _pan_gradient_term(pan, out)
    )


# loss_func3 (mylib:373-407) computes the identical quantity via nn.L1Loss.
loss_func3 = loss_func2


def loss_func8(pan, ms, out):
    """mylib:626-656: unsupervised (no ref) — blur-spectral + PAN gradient."""
    return _l1(gaussian_blur_cv(out), ms) + _pan_gradient_term(pan, out)


def loss_func9(pan, ms, out):
    """mylib:659-689: spectral term is CosineEmbeddingLoss(target=+1) =
    mean(1 − cosine over the channel axis)."""
    blur = gaussian_blur_cv(out)
    num = jnp.sum(blur * ms, axis=-1)
    den = jnp.linalg.norm(blur, axis=-1) * jnp.linalg.norm(ms, axis=-1)
    cos = num / jnp.maximum(den, 1e-8)
    return jnp.mean(1.0 - cos) + _pan_gradient_term(pan, out)


# -- feature-space losses ----------------------------------------------------


def scaled_dot_product(query, key):
    """mylib:558-563 (QKᵀ/√d_k, no softmax)."""
    d_k = query.shape[-1]
    return jnp.matmul(query, jnp.swapaxes(key, -2, -1)) / math.sqrt(d_k)


def similarity_triplet_loss(anchor, positive, negative, margin: float = 12.0):
    """mylib:551-556: hinge on similarity difference (note: *similarities*,
    so positive enters with +, negative with −)."""
    distance = (
        scaled_dot_product(anchor, positive)
        - scaled_dot_product(anchor, negative)
        + margin
    )
    return jnp.mean(jnp.maximum(distance, 0.0))


def gram_matrix(y):
    """mylib:565-570 on channels-last (B, H, W, C): G = FFᵀ/(C·H·W) with
    F the (C, H·W) feature matrix."""
    b, h, w, c = y.shape
    f = y.reshape(b, h * w, c).swapaxes(1, 2)  # (B, C, HW)
    return jnp.matmul(f, jnp.swapaxes(f, 1, 2)) / (c * h * w)


def loss_func6(ref, out, qkv, qkv_h1, margin: float = 12.0):
    """mylib:509-548: L1(out, ref) + two similarity-triplet terms +
    Gram-matrix style loss."""
    return (
        _l1(out, ref)
        + similarity_triplet_loss(*qkv, margin=margin)
        + similarity_triplet_loss(*qkv_h1, margin=margin)
        + _l1(gram_matrix(out), gram_matrix(ref))
    )


def sam_loss(t1, t2):
    """`SAMLoss` (mylib:1024-1041). The reference reshapes NCHW tensors to
    (C·H, B·W-ish) rows and takes per-column cosine; replicated exactly on
    channels-last inputs by converting to NCHW flattening order."""
    def to_rows(t):
        b, h, w, c = t.shape
        nchw = jnp.transpose(t, (0, 3, 1, 2)).reshape(b, c, h, w)
        return nchw.reshape(c * h, -1) if b == 1 else nchw.reshape(
            nchw.shape[1] * nchw.shape[2], -1
        )

    a, b_ = to_rows(t1), to_rows(t2)
    n1 = jnp.sqrt(jnp.sum(a**2, axis=0))
    n2 = jnp.sqrt(jnp.sum(b_**2, axis=0))
    cos = jnp.sum(a * b_, axis=0) / (n1 * n2 + 1e-10)
    return jnp.mean((cos - 1.0) ** 2)


def dwt_mwcnn(x):
    """`dwt` (mylib:1044-1070): unnormalised Haar butterfly, channels-last.
    x1..x4 use the reference's (row, col) parity convention."""
    x1 = x[:, 0::2, 0::2, :]
    x2 = x[:, 1::2, 0::2, :]
    x3 = x[:, 0::2, 1::2, :]
    x4 = x[:, 1::2, 1::2, :]
    ll = x1 + x2 + x3 + x4
    lh = -x1 - x3 + x2 + x4
    hl = -x1 + x3 - x2 + x4
    hh = x1 - x3 - x2 + x4
    return ll, lh, hl, hh


def loss_func22(ref, out):
    """mylib:1072-1096: L1(ref, out) + 0.1·SAM(LL) + 0.5·L1(high bands)."""
    r = dwt_mwcnn(ref)
    o = dwt_mwcnn(out)
    loss_l = sam_loss(r[0], o[0])
    rh = jnp.concatenate(r[1:], axis=-1)
    oh = jnp.concatenate(o[1:], axis=-1)
    return _l1(ref, out) + 0.1 * loss_l + 0.5 * _l1(rh, oh)


def _off_diagonal(x):
    n = x.shape[0]
    return x.reshape(-1)[:-1].reshape(n - 1, n + 1)[:, 1:].reshape(-1)


def _bn(x, eps: float = 1e-5):
    """BatchNorm1d(affine=False) in train mode: per-feature batch stats
    (biased variance, torch semantics)."""
    mean = jnp.mean(x, axis=0)
    var = jnp.var(x, axis=0)
    return (x - mean) / jnp.sqrt(var + eps)


def floss(f1, f2, w1, b1, w2, b2, lambd: float = 1.0):
    """`FLoss` (mylib:817-850), functional: Barlow-Twins-style
    cross-correlation between two projected feature batches. f1/f2 are
    (B, C, M, N)-flattened features (any trailing layout — flattened
    row-major like torch.reshape); w/b are the two Linear projections."""
    f1 = f1.reshape(f1.shape[0], -1)
    f2 = f2.reshape(f2.shape[0], -1)
    p1 = _bn(f1 @ w1.T + b1)
    p2 = _bn(f2 @ w2.T + b2)
    c = _bn(p1).T @ _bn(p2)
    on_diag = jnp.sum((jnp.diagonal(c) - 1.0) ** 2)
    off_diag = jnp.sum(_off_diagonal(c) ** 2)
    return on_diag + lambd * off_diag


LOSS_ZOO = {
    "loss_func1": loss_func1,
    "loss_func2": loss_func2,
    "loss_func3": loss_func3,
    "loss_func6": loss_func6,
    "loss_func8": loss_func8,
    "loss_func9": loss_func9,
    "loss_func22": loss_func22,
    "sam_loss": sam_loss,
    "floss": floss,
    "similarity_triplet_loss": similarity_triplet_loss,
}
