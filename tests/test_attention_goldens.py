"""Attention stack + PGCU golden parity via torch weight transplant."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _lin(w):
    return np.transpose(w, (1, 0))


def _conv2d(w):  # torch (O, I, kh, kw) -> (kh, kw, I, O)
    return np.transpose(w, (2, 3, 1, 0))


@pytest.fixture(scope="module")
def att():
    return np.load(os.path.join(GOLDEN, "attention.npz"))


def _cross_params(sd, prefix):
    return {
        "to_q": {"kernel": _lin(sd[f"{prefix}to_q.weight"])},
        "to_k": {"kernel": _lin(sd[f"{prefix}to_k.weight"])},
        "to_v": {"kernel": _lin(sd[f"{prefix}to_v.weight"])},
        "to_out": {
            "kernel": _lin(sd[f"{prefix}to_out.0.weight"]),
            "bias": sd[f"{prefix}to_out.0.bias"],
        },
    }


@pytest.mark.parametrize("use_flash", [True, False])
def test_cross_attention_golden(att, use_flash):
    from tmdiff_tpu.ops.attention import CrossAttention

    x = jnp.asarray(att["x"])
    ctx = jnp.asarray(att["ctx"])
    m = CrossAttention(heads=4, dim_head=8, use_flash=use_flash)
    params = {"params": _cross_params(att, "ca.")}
    y = m.apply(params, x, ctx)
    np.testing.assert_allclose(np.asarray(y), att["y_cross"], atol=2e-5)

    m_self = CrossAttention(heads=4, dim_head=8, use_flash=use_flash)
    y_self = m_self.apply({"params": _cross_params(att, "sa.")}, x)
    np.testing.assert_allclose(np.asarray(y_self), att["y_self"], atol=2e-5)


def test_spatial_self_attention_golden(att):
    from tmdiff_tpu.ops.attention import SpatialSelfAttention

    img = jnp.asarray(np.moveaxis(att["img"], 1, -1))  # (B, H, W, C)
    m = SpatialSelfAttention(use_flash=True)
    params = {"params": {
        "norm": {"scale": att["ssa.norm.weight"], "bias": att["ssa.norm.bias"]},
        **{
            name: {
                "kernel": _conv2d(att[f"ssa.{name}.weight"]),
                "bias": att[f"ssa.{name}.bias"],
            }
            for name in ("q", "k", "v", "proj_out")
        },
    }}
    y = m.apply(params, img)
    ref = np.moveaxis(att["y_ssa"], 1, -1)
    np.testing.assert_allclose(np.asarray(y), ref, atol=3e-5)


def test_pgcu_golden():
    from tmdiff_tpu.ops.pgcu import PGCU

    g = np.load(os.path.join(GOLDEN, "pgcu.npz"))
    sd = {k[3:]: g[k] for k in g.files if k.startswith("sd.")}
    pan = jnp.asarray(np.moveaxis(g["pan"], 1, -1))
    ms = jnp.asarray(np.moveaxis(g["ms"], 1, -1))

    m = PGCU(channels=4, vec_len=128, num_blocks=3)
    params = jax.tree.map(np.zeros_like,
                          m.init(jax.random.key(0), pan, ms)["params"])

    def conv(prefix):
        return {"kernel": _conv2d(sd[f"{prefix}.weight"]),
                "bias": sd[f"{prefix}.bias"]}

    for name in ("FPConv", "FMConv", "FConv", "GConv", "VConv", "FineAdjust"):
        params[name] = conv(name)
    for tower, tname, n in (("GPConv", "GP", 3), ("GMConv", "GM", 2),
                            ("VPConv", "VP", 3), ("VMConv", "VM", 2)):
        for i in range(n):
            params[f"{tname}DSBlock{i}"] = {
                "Conv": conv(f"{tower}.DSBlock{i}.Conv")
            }
    for proj, pname in (("FLinear", "FLinear"), ("GLinear", "GLinear")):
        ws, bs, ns_, nb = [], [], [], []
        for c in range(4):
            ws.append(_lin(sd[f"{proj}.{c}.0.weight"]))
            bs.append(sd[f"{proj}.{c}.0.bias"])
            ns_.append(sd[f"{proj}.{c}.1.weight"])
            nb.append(sd[f"{proj}.{c}.1.bias"])
        params[pname] = {
            "kernel": np.stack(ws), "bias": np.stack(bs),
            "norm_scale": np.stack(ns_), "norm_bias": np.stack(nb),
        }
    y = m.apply({"params": params}, pan, ms)
    ref = np.moveaxis(g["y"], 1, -1)
    np.testing.assert_allclose(np.asarray(y), ref, atol=5e-4)


def test_channel_attention_golden():
    """NCSN++ AttnBlockpp transplant: the reference folds (C, N) bands into
    channels before attention; ours takes the folded channels-last map."""
    from tmdiff_tpu.ops.attention import ChannelSelfAttention

    g = np.load(os.path.join(GOLDEN, "attnpp.npz"))
    sd = {k[3:]: g[k] for k in g.files if k.startswith("sd.")}
    b, c_, n, h, w = g["x"].shape
    # (B, C, N, H, W) -> folded (B, C*N, H, W) -> channels-last (B, H, W, 64)
    x = jnp.asarray(np.moveaxis(g["x"].reshape(b, c_ * n, h, w), 1, -1))
    m = ChannelSelfAttention(skip_rescale=True)
    params = {"params": {
        "GroupNorm_0": {"scale": sd["GroupNorm_0.weight"],
                        "bias": sd["GroupNorm_0.bias"]},
        # NIN.W is (in, units) == flax Dense kernel layout directly
        **{f"NIN_{i}": {"kernel": sd[f"NIN_{i}.W"], "bias": sd[f"NIN_{i}.b"]}
           for i in range(4)},
    }}
    y = m.apply(params, x)
    ref = np.moveaxis(g["y"].reshape(b, c_ * n, h, w), 1, -1)
    np.testing.assert_allclose(np.asarray(y), ref, atol=3e-5)
