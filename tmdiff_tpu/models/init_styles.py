"""Post-init weight re-initialisation styles.

Parity surface: `/root/reference/GeneralModel/networks.py:16-77` — after
construction, `init_weights` re-initialises the whole network in one of
three styles selected by `model.init_type`:

  * "normal":     N(0, 0.02) for every Conv* and Linear weight;
  * "kaiming":    kaiming-normal fan-in — but the classname match is
                  'Conv2d'/'Linear', so the reference's Conv3d layers KEEP
                  their torch default init and only Linear layers change
                  (reference quirk, reproduced);
  * "orthogonal": orthogonal(gain=1) for every Conv* and Linear weight.

Biases zero in all styles. Applied to a flax param tree by leaf-name
heuristics: Dense kernels are rank-2 'kernel' leaves, conv kernels rank>2.

A fourth style, "torch", is NOT an upstream name: it reproduces the
reference's exact post-`init_weights("kaiming")` state including what the
quirk leaves behind — Conv3d layers at the torch module DEFAULTS
(`torch.nn.modules.conv._ConvNd.reset_parameters`: kaiming_uniform(a=√5)
weights = U(±1/√fan_in), biases U(±1/√fan_in)) and Linear layers kaiming-
normal with ZERO bias (including the style projections, which "kaiming"
here keeps at bias 1 — see ModConv3d's documented deviation). Measured
motivation: at matched 1000-step training the torch reference reaches
l_pix 0.0054 / SAM 0.35 while the flax-default-conv init plateaus at
0.0138 / 0.84 — the init distribution is a convergence-speed lever, see
BASELINE.md "Trained head-to-head".
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _orthogonal(rng, shape, dtype):
    flat = (int(np.prod(shape[:-1])), shape[-1])
    a = jax.random.normal(rng, flat, dtype)
    q, r = jnp.linalg.qr(a if flat[0] >= flat[1] else a.T)
    q = q * jnp.sign(jnp.diagonal(r))[None, :]
    if flat[0] < flat[1]:
        q = q.T
    return q.reshape(shape).astype(dtype)


def _kaiming_normal_fan_in(rng, shape, dtype):
    # torch kaiming_normal_(a=0, fan_in) on Linear weight (out, in):
    # std = sqrt(2 / fan_in); flax Dense kernel is (in, out) → fan_in = shape[0].
    fan_in = shape[0]
    return jax.random.normal(rng, shape, dtype) * jnp.sqrt(2.0 / fan_in)


def _torch_reference_leaf(rng, key, leaf, shapes):
    """One leaf of the reference's post-init_weights('kaiming') state
    (`/root/reference/GeneralModel/networks.py:31-45` + torch conv/linear
    defaults). Conv fan_in in the flax kernel layout (*k, in, out) is
    prod(shape[:-1]) — identical to torch's in_channels·prod(kernel).
    Special cases reproduced exactly:
      * `up_kernel`/`up_bias` (ConvTranspose3d, untouched by the kaiming
        quirk): torch `_calculate_fan_in_and_fan_out` reads fan_in from
        weight.size(1), which for TRANSPOSED convs is the OUT channels —
        fan_in = out·prod(k), for both weight and bias bounds.
      * `kernels` (Dynamic_conv stacked (K, *k, in, out)): upstream
        re-inits each expert with DEFAULT `kaiming_uniform_` (gain √2 →
        bound √(6/fan), per-expert fan = in·prod(k); `dynamic_conv.py:71-72`)
        and leaves its zeros bias untouched (`:63`)."""
    name = key[-1]
    if name == "up_kernel":
        fan_in = float(np.prod(leaf.shape[:-2]) * leaf.shape[-1])
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(rng, leaf.shape, leaf.dtype, -bound, bound)
    if name == "kernels" and leaf.ndim > 2:
        bound = np.sqrt(6.0 / float(np.prod(leaf.shape[1:-1])))
        return jax.random.uniform(rng, leaf.shape, leaf.dtype, -bound, bound)
    if name == "kernel" and leaf.ndim > 2:
        # torch Conv3d default: kaiming_uniform(a=√5) → U(±1/√fan_in)
        bound = 1.0 / np.sqrt(float(np.prod(leaf.shape[:-1])))
        return jax.random.uniform(
            rng, leaf.shape, leaf.dtype, -bound, bound)
    if name == "kernel" and leaf.ndim == 2:
        # upstream weights_init_kaiming on every Linear (incl. style/Dense)
        return _kaiming_normal_fan_in(rng, leaf.shape, leaf.dtype)
    if name == "up_bias":
        k_shape = shapes.get(key[:-1] + ("up_kernel",))
        if k_shape is not None:
            fan_in = float(np.prod(k_shape[:-2]) * k_shape[-1])
            bound = 1.0 / np.sqrt(fan_in)
            return jax.random.uniform(
                rng, leaf.shape, leaf.dtype, -bound, bound)
        return leaf
    if name == "bias":
        if shapes.get(key[:-1] + ("kernels",)) is not None:
            # Dynamic_conv bias: created as zeros, never re-initialised
            return jnp.zeros_like(leaf)
        sibling = shapes.get(key[:-1] + ("kernel",))
        if sibling is not None and len(sibling) > 2:
            # torch Conv3d default bias: U(±1/√fan_in) of the conv kernel
            bound = 1.0 / np.sqrt(float(np.prod(sibling[:-1])))
            return jax.random.uniform(
                rng, leaf.shape, leaf.dtype, -bound, bound)
        return jnp.zeros_like(leaf)  # Linear biases zeroed upstream
    return leaf


def apply_init_style(params, init_type: str, rng: jax.Array):
    """Re-initialise a flax param tree in the reference's style. Returns a
    new tree; unknown leaves (biases, norms, tables) are zeroed/kept per the
    rules above."""
    if init_type not in ("normal", "kaiming", "orthogonal", "torch"):
        raise NotImplementedError(init_type)

    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    shapes = {
        tuple(str(p.key) for p in path): leaf.shape for path, leaf in leaves
    }
    new = {}
    for i, (path, leaf) in enumerate(leaves):
        key = tuple(str(p.key) for p in path)
        name = key[-1]
        sub = jax.random.fold_in(rng, i)
        if init_type == "torch":
            new[key] = _torch_reference_leaf(sub, key, leaf, shapes)
        elif name == "bias":
            # Keep modulation-style biases at 1 (see ModConv3d): zeroing them
            # (as the reference's init does) re-creates the near-dead-start
            # failure mode guarded by tests/test_grad_health.py.
            if len(key) >= 2 and key[-2] == "style":
                new[key] = jnp.ones_like(leaf)
            else:
                new[key] = jnp.zeros_like(leaf)
        elif name in ("kernel", "kernels", "up_kernel") and leaf.ndim >= 2:
            is_dense = leaf.ndim == 2
            if init_type == "normal":
                new[key] = jax.random.normal(sub, leaf.shape, leaf.dtype) * 0.02
            elif init_type == "orthogonal":
                new[key] = _orthogonal(sub, leaf.shape, leaf.dtype)
            else:  # kaiming — reference quirk: only Linear layers change
                if is_dense:
                    new[key] = _kaiming_normal_fan_in(sub, leaf.shape, leaf.dtype)
                else:
                    new[key] = leaf
        else:
            new[key] = leaf

    def rebuild(path, leaf):
        return new[tuple(str(p.key) for p in path)]

    return jax.tree_util.tree_map_with_path(rebuild, params)
