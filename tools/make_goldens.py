"""Generate golden test fixtures from the torch reference (CPU, fp32/fp64).

Runs pieces of /root/reference on CPU torch and stores their outputs as .npz
fixtures under tests/golden/. The test suite then never needs torch or the
reference checkout. Re-run with:  python tools/make_goldens.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
import fake_pywt  # noqa: E402

sys.modules["pywt"] = fake_pywt

# torchvision isn't installed; the reference only touches a couple of
# transform constructors at import time — stub them.
import types  # noqa: E402

class _AnyTransform:
    def __getattr__(self, name):
        return lambda *a, **k: (lambda x: x)


import importlib.machinery  # noqa: E402

_tv = types.ModuleType("torchvision")
_tv.transforms = _AnyTransform()
_tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
_tv.__version__ = "0.0.0"
sys.modules["torchvision"] = _tv
sys.modules["torchvision.transforms"] = _tv.transforms

sys.path.insert(0, "/root/reference")

import numpy as np  # noqa: E402
import torch  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
os.makedirs(OUT, exist_ok=True)
torch.manual_seed(3407)
rng = np.random.default_rng(3407)


def golden_dwt():
    from DWT_IDWT.DWT_IDWT_layer import DWT_2D, IDWT_2D, DWT_1D, DWT_3D

    out = {}
    for wavelet in ["haar", "db2"]:
        x = rng.standard_normal((2, 3, 16, 12)).astype(np.float32)
        ll, lh, hl, hh = DWT_2D(wavelet)(torch.from_numpy(x))
        rec = IDWT_2D(wavelet)(ll, lh, hl, hh)
        out[f"{wavelet}_x"] = x
        out[f"{wavelet}_ll"] = ll.numpy()
        out[f"{wavelet}_lh"] = lh.numpy()
        out[f"{wavelet}_hl"] = hl.numpy()
        out[f"{wavelet}_hh"] = hh.numpy()
        out[f"{wavelet}_rec"] = rec.numpy()
    # 1-D
    x1 = rng.standard_normal((2, 3, 16)).astype(np.float32)
    lo, hi = DWT_1D("haar")(torch.from_numpy(x1))
    out["haar1d_x"] = x1
    out["haar1d_lo"] = lo.numpy()
    out["haar1d_hi"] = hi.numpy()
    # 3-D
    x3 = rng.standard_normal((1, 2, 4, 8, 6)).astype(np.float32)
    bands3 = DWT_3D("haar")(torch.from_numpy(x3))
    names = ["lll", "llh", "lhl", "lhh", "hll", "hlh", "hhl", "hhh"]
    out["haar3d_x"] = x3
    for name, band in zip(names, bands3):
        out[f"haar3d_{name}"] = band.numpy()
    np.savez(os.path.join(OUT, "dwt.npz"), **out)
    print("dwt goldens written")


def golden_schedules():
    from GeneralModel.diffusion_general import make_beta_schedule

    out = {}
    for schedule in ["linear", "cosine"]:
        for T in [100, 1000]:
            out[f"{schedule}_{T}"] = make_beta_schedule(schedule, T)
    np.savez(os.path.join(OUT, "schedules.npz"), **out)
    print("schedule goldens written")


def golden_gamma_embedding():
    from GeneralModel.Hyper_unet_general import gamma_embedding

    t = torch.tensor([1.0, 7.0, 500.0, 1000.0, 1001.0])
    out = {
        "t": t.numpy(),
        "dim32": gamma_embedding(t, 32).numpy(),
        "dim31": gamma_embedding(t, 31).numpy(),
    }
    np.savez(os.path.join(OUT, "gamma_embedding.npz"), **out)
    print("gamma embedding goldens written")


def golden_modulated_conv():
    """modulated_conv3d vs the activation-scaling identity, plus raw output."""
    from GeneralModel.Hyper_unet_general import modulated_conv3d

    x = torch.from_numpy(rng.standard_normal((2, 5, 4, 8, 8)).astype(np.float32))
    w = torch.from_numpy(rng.standard_normal((7, 5, 3, 3, 3)).astype(np.float32))
    s = torch.from_numpy(rng.standard_normal((2, 5)).astype(np.float32))
    y = modulated_conv3d(x=x, w=w, s=s[:, :, None, None], stride=(1, 1, 1), padding=(1, 1, 1))
    np.savez(
        os.path.join(OUT, "modulated_conv.npz"),
        x=x.numpy(), w=w.numpy(), s=s.numpy(), y=y.numpy(),
    )
    print("modulated conv goldens written")


if __name__ == "__main__":
    golden_dwt()
    golden_schedules()
    golden_gamma_embedding()
    golden_modulated_conv()
