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
_tvu = types.ModuleType("torchvision.utils")
_tvu.save_image = lambda *a, **k: None
_tvu.make_grid = lambda *a, **k: None
_tv.utils = _tvu
sys.modules["torchvision.utils"] = _tvu

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


def golden_wavbest():
    """Full reference WavBEST forward on CPU with a stubbed CLIP encoder.

    Saves the torch state_dict (numpy) + inputs/outputs so the test suite can
    transplant weights into the flax model and compare end to end."""
    sys.path.insert(0, "/root/repo")
    from tmdiff_tpu.models.clip_text import get_prompt_embedding

    # Neutralise the hard-coded .to("cuda") calls in the reference forward.
    _orig_to = torch.Tensor.to

    def _cpu_to(self, *args, **kwargs):
        args = tuple(
            a for a in args
            if not (isinstance(a, (str, torch.device)) and "cuda" in str(a))
        )
        if "cuda" in str(kwargs.get("device", "")):
            kwargs.pop("device")
        if not args and not kwargs:
            return self
        return _orig_to(self, *args, **kwargs)

    torch.Tensor.to = _cpu_to

    import GeneralModel.Hyper_unet_general as ref_unet

    class FakeClip:
        def __init__(self, *a, **k):
            pass

        def encode(self, text):
            # Deterministic stand-in; the flax side receives the same vector.
            import hashlib
            seed = int.from_bytes(hashlib.sha256(text.encode()).digest()[:8], "little")
            vec = np.random.default_rng(seed).standard_normal(768)
            vec = vec / np.linalg.norm(vec) * np.sqrt(768)
            return torch.from_numpy(vec.astype(np.float32))[None]

    ref_unet.FrozenCLIPEmbedder = FakeClip
    torch.manual_seed(3407)
    model = ref_unet.WavBEST(channels=[8, 16, 32, 64])
    model.eval()

    B, bands, H, W = 2, 4, 16, 16
    x = torch.from_numpy(rng.standard_normal((B, bands, H, W)).astype(np.float32))
    pan = torch.from_numpy(rng.standard_normal((B, 1, H, W)).astype(np.float32))
    ms = torch.from_numpy(rng.standard_normal((B, bands, H, W)).astype(np.float32))
    t = torch.tensor([[17], [912]])
    with torch.no_grad():
        y = model(x, t, pan, ms, "QB")

    sd = {
        k: v.numpy() for k, v in model.state_dict().items()
        if "clip_text" not in k
    }
    prompt_vec = model.get_embeding("QB").numpy()[0]
    np.savez(
        os.path.join(OUT, "wavbest.npz"),
        x=x.numpy(), pan=pan.numpy(), ms=ms.numpy(),
        t=t.numpy().reshape(-1), y=y.numpy(), prompt=prompt_vec,
        **{"sd." + k: v for k, v in sd.items()},
    )
    torch.Tensor.to = _orig_to
    print("wavbest goldens written, out shape", y.shape)


def golden_pipeline():
    """END-TO-END sampler goldens: the tiny reference WavBEST driven through
    `GeneralDiffusion.sample_by_dpmsolver` (x_start, 30-step singlestep
    order-3 logSNR, dynamic thresholding, denoise-to-zero,
    `diffusion_general.py:227-255`) and the legacy ancestral `p_sample_loop`
    (`:210-225`, noise-inversion `p_mean_variance`), with every noise draw
    recorded so the JAX side can replay the exact trajectory through
    `Pansharpener.sample` (model × solver × res2img composition)."""
    sys.path.insert(0, "/root/repo")

    _orig_to = torch.Tensor.to

    def _cpu_to(self, *args, **kwargs):
        args = tuple(
            a for a in args
            if not (isinstance(a, (str, torch.device)) and "cuda" in str(a))
        )
        if "cuda" in str(kwargs.get("device", "")):
            kwargs.pop("device")
        if not args and not kwargs:
            return self
        return _orig_to(self, *args, **kwargs)

    torch.Tensor.to = _cpu_to

    import GeneralModel.Hyper_unet_general as ref_unet
    import GeneralModel.diffusion_general as ref_diff

    class FakeClip:
        def __init__(self, *a, **k):
            pass

        def encode(self, text):
            import hashlib
            seed = int.from_bytes(hashlib.sha256(text.encode()).digest()[:8], "little")
            vec = np.random.default_rng(seed).standard_normal(768)
            vec = vec / np.linalg.norm(vec) * np.sqrt(768)
            return torch.from_numpy(vec.astype(np.float32))[None]

    ref_unet.FrozenCLIPEmbedder = FakeClip
    torch.manual_seed(3407)
    model = ref_unet.WavBEST(channels=[8, 16, 32, 64])
    model.eval()

    # B=1: the reference's x_start noise_pred_fn broadcasts a (B,)-shaped
    # alpha_t straight into the image tensor, which only works at batch 1 —
    # exactly how the reference val loop runs it (`dpm_solver_pytorch.py:306`,
    # batch-1 val at `general_…finetune.py:126-152`).
    B, bands, H, W = 1, 4, 16, 16
    pan = rng.standard_normal((B, 1, H, W)).astype(np.float32)
    ms = rng.standard_normal((B, bands, H, W)).astype(np.float32)
    res = rng.standard_normal((B, bands, H, W)).astype(np.float32)
    x_in = {
        "Res": torch.from_numpy(res),
        "PAN": torch.from_numpy(pan),
        "MS": torch.from_numpy(ms),
    }

    diffusion = ref_diff.GeneralDiffusion(denoise_fn=model, loss_type="l1")

    # Record/replay every torch noise draw.
    x_T = rng.standard_normal((B, bands, H, W)).astype(np.float32)
    step_draws = []

    _orig_randn, _orig_randn_like = torch.randn, torch.randn_like

    def fake_randn(*args, **kwargs):
        return torch.from_numpy(x_T.copy())

    def fake_randn_like(x):
        step_draws.append(rng.standard_normal(tuple(x.shape)).astype(np.float32))
        return torch.from_numpy(step_draws[-1])

    torch.randn, torch.randn_like = fake_randn, fake_randn_like
    try:
        # -- DPM-Solver++ path (T=1000 cosine, reference val default) --
        diffusion.set_new_noise_schedule(
            {"schedule": "cosine", "n_timestep": 1000}, device="cpu"
        )
        with torch.no_grad():
            y_dpm = diffusion.sample_by_dpmsolver(x_in, "QB").numpy()

        # -- legacy ancestral path (T=100 keeps the fixture fast) --
        T_anc = 100
        diffusion.set_new_noise_schedule(
            {"schedule": "cosine", "n_timestep": T_anc}, device="cpu"
        )
        step_draws.clear()
        with torch.no_grad():
            y_anc = diffusion.p_sample_loop(
                x_in, continous=False, prompt="QB"
            ).numpy()
        # draw j (j=0..T-2) happened at timestep t = T-1-j; row 0 unused.
        step_noise = np.zeros((T_anc, B, bands, H, W), np.float32)
        for j, draw in enumerate(step_draws):
            step_noise[T_anc - 1 - j] = draw
    finally:
        torch.randn, torch.randn_like = _orig_randn, _orig_randn_like
        torch.Tensor.to = _orig_to

    sd = {
        k: v.numpy() for k, v in model.state_dict().items()
        if "clip_text" not in k
    }
    prompt_vec = model.get_embeding("QB").numpy()[0]
    np.savez(
        os.path.join(OUT, "pipeline.npz"),
        pan=pan, ms=ms, res=res, x_T=x_T,
        step_noise=step_noise, T_anc=np.array(T_anc),
        y_dpm=y_dpm, y_anc=y_anc, prompt=prompt_vec,
        **{"sd." + k: v for k, v in sd.items()},
    )
    print("pipeline goldens written; dpm", y_dpm.shape, "anc", y_anc.shape)


def golden_dpm_solver():
    """Reference DPM-Solver runs on analytic toy models, several configs."""
    from core.dpm_solver_pytorch import NoiseScheduleVP, model_wrapper, DPM_Solver
    from GeneralModel.diffusion_general import make_beta_schedule

    betas = torch.from_numpy(make_beta_schedule("cosine", 1000)).float()
    x_T = torch.from_numpy(rng.standard_normal((1, 3, 8, 8)).astype(np.float32))
    cond = torch.from_numpy(rng.standard_normal((1, 3, 8, 8)).astype(np.float32))

    def toy(x, t, *extra):
        t4 = t.reshape(-1, 1, 1, 1).float()
        out = torch.tanh(x) * 0.7 + torch.sin(x * 2.0) * (t4 / 1000.0)
        if extra:
            out = out + 0.1 * extra[0]
        return out

    def toy_linear(x, t, *extra):
        # Linear in x: the un-thresholded vanilla-dpmsolver trajectory is
        # chaotic under a nonlinear toy (1e-6 input perturbation → ~50%
        # output change), making fp32 parity ill-posed; a linear model keeps
        # sensitivity linear.
        t4 = t.reshape(-1, 1, 1, 1).float()
        return 0.3 * x + 0.05 * (t4 / 1000.0) * x

    out = {"x_T": x_T.numpy(), "betas": betas.numpy(), "cond": cond.numpy()}
    ns = NoiseScheduleVP(schedule="discrete", betas=betas)

    configs = {
        # name: (model_type, algo, kwargs for .sample, correcting, guidance)
        "ss3_xstart": ("x_start", "dpmsolver++",
                       dict(steps=30, order=3, skip_type="logSNR",
                            method="singlestep", denoise_to_zero=True),
                       "dynamic_thresholding", None),
        "ms3_noise": ("noise", "dpmsolver++",
                      dict(steps=50, order=3, skip_type="logSNR",
                           method="multistep", denoise_to_zero=True),
                      "dynamic_thresholding", None),
        "ms2_short": ("x_start", "dpmsolver++",
                      dict(steps=8, order=2, skip_type="time_uniform",
                           method="multistep"),
                      "dynamic_thresholding", None),
        "ssfix2_eps": ("noise", "dpmsolver",
                       dict(steps=10, order=2, skip_type="time_uniform",
                            method="singlestep_fixed"),
                       None, None),
        "ms2_cfg": ("noise", "dpmsolver++",
                    dict(steps=50, order=2, skip_type="logSNR",
                         method="multistep"),
                    "dynamic_thresholding", 3.0),
    }
    for name, (mtype, algo, kwargs, correct, guidance) in configs.items():
        net = toy_linear if name == "ssfix2_eps" else toy
        if guidance is not None:
            fn = model_wrapper(
                net, ns, model_type=mtype, guidance_type="classifier-free",
                condition=cond, unconditional_condition=torch.zeros_like(cond),
                guidance_scale=guidance,
            )
        else:
            fn = model_wrapper(net, ns, model_type=mtype)
        solver = DPM_Solver(fn, ns, algorithm_type=algo, correcting_x0_fn=correct)
        with torch.no_grad():
            out[name] = solver.sample(x_T.clone(), **kwargs).numpy()

    # library tail (`dpm_solver_pytorch.py:982-1079`): adaptive step size,
    # ODE inversion (data → noise), add_noise. Linear toy keeps the
    # accept/reject sequence numerically robust across frameworks.
    fn_lin = model_wrapper(toy_linear, ns, model_type="noise")
    for order in (2, 3):
        solver = DPM_Solver(fn_lin, ns, algorithm_type="dpmsolver")
        with torch.no_grad():
            out[f"adaptive{order}_eps"] = solver.sample(
                x_T.clone(), method="adaptive", order=order,
                atol=0.0078, rtol=0.05,
            ).numpy()
    solver_pp = DPM_Solver(fn_lin, ns, algorithm_type="dpmsolver++")
    x0_like = torch.tanh(x_T.clone())
    with torch.no_grad():
        out["inverse_ms2"] = solver_pp.inverse(
            x0_like, steps=8, order=2, skip_type="time_uniform",
            method="multistep",
        ).numpy()
    out["inverse_input"] = x0_like.numpy()
    t_noise = torch.tensor([0.2, 0.5, 0.9])
    eps_fixed = torch.from_numpy(
        rng.standard_normal((3, *x_T.shape)).astype(np.float32)
    )
    with torch.no_grad():
        out["add_noise_t"] = t_noise.numpy()
        out["add_noise_eps"] = eps_fixed.numpy()
        out["add_noise_xt"] = solver_pp.add_noise(
            x_T.clone(), t_noise, noise=eps_fixed
        ).numpy()
    np.savez(os.path.join(OUT, "dpm_solver.npz"), **out)
    print("dpm solver goldens written")


def golden_dynamic_conv():
    """Reference Dynamic_conv3d forward + weights for transplant parity."""
    from core.dynamic_conv import Dynamic_conv3d

    torch.manual_seed(7)
    m = Dynamic_conv3d(
        in_planes=6, out_planes=5, kernel_size=3, ratio=0.25,
        stride=1, padding=1, K=4, temperature=31,
    )
    m.eval()
    x = torch.from_numpy(rng.standard_normal((3, 6, 4, 8, 8)).astype(np.float32))
    with torch.no_grad():
        y = m(x)
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    np.savez(
        os.path.join(OUT, "dynamic_conv.npz"),
        x=x.numpy(), y=y.numpy(), temperature=np.array(31.0),
        **{"sd." + k: v for k, v in sd.items()},
    )
    print("dynamic conv goldens written")


def golden_kernel_adaption():
    """Reference Gaussian/free PSF degradations."""
    from core.kernelAdaption import EntireKernel, GaussianKernel, kernel_generator

    torch.manual_seed(9)
    q = 5 * torch.eye(2) + 0.3 * torch.randn(2, 2)
    psf = kernel_generator(q, kernel_size=5, scale_factor=4).numpy()[0, 0]

    z = torch.from_numpy(rng.standard_normal((2, 4, 32, 32)).astype(np.float32))
    gk = GaussianKernel(kernel_size=5, bands=4, scale_factor=4)
    with torch.no_grad():
        gk_out = gk(z)
    ek = EntireKernel(kernel_size=4, bands=4, scale_factor=4)
    with torch.no_grad():
        ek_out = ek(z)
    np.savez(
        os.path.join(OUT, "kernel_adaption.npz"),
        q=q.numpy(), psf=psf, z=z.numpy(),
        gk_param=gk.KernelParam.detach().numpy(), gk_out=gk_out.numpy(),
        ek_param=ek.KernelAdaption.detach().numpy(), ek_out=ek_out.numpy(),
    )
    print("kernel adaption goldens written")


def golden_unet_legacy():
    """Legacy strided-conv down / transpose-conv up blocks (unet_util.py)."""
    from GeneralModel import unet_util as uu

    torch.manual_seed(11)
    down = uu.ResblockDownOneModulateBEST(4, 6, embed_dim=8)
    up = uu.ResblockUpOneModulateBEST(6, 6, embed_dim=8)
    down.eval(); up.eval()
    x = torch.from_numpy(rng.standard_normal((2, 4, 4, 16, 16)).astype(np.float32))
    embed = torch.from_numpy(rng.standard_normal((2, 8)).astype(np.float32))
    ctx = torch.from_numpy(rng.standard_normal((2, 8)).astype(np.float32))
    xu = torch.from_numpy(rng.standard_normal((2, 6, 4, 7, 7)).astype(np.float32))
    with torch.no_grad():
        y_down = down(x, embed, ctx)
        y_up = up(xu, embed, xu.clone(), xu.clone(), ctx)
    np.savez(
        os.path.join(OUT, "unet_legacy.npz"),
        x=x.numpy(), embed=embed.numpy(), ctx=ctx.numpy(), xu=xu.numpy(),
        y_down=y_down.numpy(), y_up=y_up.numpy(),
        **{"down." + k: v.numpy() for k, v in down.state_dict().items()},
        **{"up." + k: v.numpy() for k, v in up.state_dict().items()},
    )
    print("unet legacy goldens written; down", y_down.shape, "up", y_up.shape)


def golden_attention():
    """Reference CrossAttention (self + cross) and SpatialSelfAttention."""
    from core import Attention as A

    torch.manual_seed(13)
    ca = A.CrossAttention(query_dim=32, context_dim=24, heads=4, dim_head=8)
    sa = A.CrossAttention(query_dim=32, heads=4, dim_head=8)  # self-attn
    ssa = A.SpatialSelfAttention(in_channels=64)
    ca.eval(); sa.eval(); ssa.eval()
    x = torch.from_numpy(rng.standard_normal((2, 10, 32)).astype(np.float32))
    ctx = torch.from_numpy(rng.standard_normal((2, 6, 24)).astype(np.float32))
    img = torch.from_numpy(rng.standard_normal((1, 64, 8, 8)).astype(np.float32))
    with torch.no_grad():
        y_cross = ca(x, ctx)
        y_self = sa(x)
        y_ssa = ssa(img)
    np.savez(
        os.path.join(OUT, "attention.npz"),
        x=x.numpy(), ctx=ctx.numpy(), img=img.numpy(),
        y_cross=y_cross.numpy(), y_self=y_self.numpy(), y_ssa=y_ssa.numpy(),
        **{"ca." + k: v.numpy() for k, v in ca.state_dict().items()},
        **{"sa." + k: v.numpy() for k, v in sa.state_dict().items()},
        **{"ssa." + k: v.numpy() for k, v in ssa.state_dict().items()},
    )
    print("attention goldens written")


def golden_attnpp():
    """NCSN++ AttnBlockpp channel-folded spatial attention
    (`Hyper_unet_general.py:483-515`)."""
    import GeneralModel.Hyper_unet_general as ref_unet

    torch.manual_seed(19)
    m = ref_unet.AttnBlockpp(channels=64, skip_rescale=True)
    m.eval()
    # reference input is 5-D band-as-depth; C*N folds to 64
    x = torch.from_numpy(rng.standard_normal((2, 16, 4, 8, 8)).astype(np.float32))
    with torch.no_grad():
        y = m(x)
    np.savez(
        os.path.join(OUT, "attnpp.npz"),
        x=x.numpy(), y=y.numpy(),
        **{"sd." + k: v.numpy() for k, v in m.state_dict().items()},
    )
    print("attnpp goldens written; out", y.shape)


def golden_orphan_blocks():
    """ChannelWiseAttention (`Hyper_unet_general.py:130-155`) and
    AdaptiveGroupNorm (`:311-331`) — the defined-but-unused UNet blocks."""
    import GeneralModel.Hyper_unet_general as ref_unet

    torch.manual_seed(23)
    cwa = ref_unet.ChannelWiseAttention(num_channels=32, reduction_ratio=16)
    agn = ref_unet.AdaptiveGroupNorm(num_groups=4, in_channel=32, style_dim=24)
    cwa.eval(); agn.eval()
    x = torch.from_numpy(rng.standard_normal((2, 32, 4, 8, 8)).astype(np.float32))
    style = torch.from_numpy(rng.standard_normal((2, 24)).astype(np.float32))
    with torch.no_grad():
        y_cwa = cwa(x)
        y_agn = agn(x, style)
    np.savez(
        os.path.join(OUT, "orphan_blocks.npz"),
        x=x.numpy(), style=style.numpy(),
        y_cwa=y_cwa.numpy(), y_agn=y_agn.numpy(),
        **{"cwa." + k: v.numpy() for k, v in cwa.state_dict().items()},
        **{"agn." + k: v.numpy() for k, v in agn.state_dict().items()},
    )
    print("orphan block goldens written")


def golden_loss_zoo():
    """Reference experimental losses (`core/mylib.py:310-1540`): the named
    loss_funcN combinations, SAMLoss, dwt butterfly, FLoss."""
    # Neutralise hard-coded .cuda() calls inside the loss code.
    _orig_tcuda = torch.Tensor.cuda
    _orig_mcuda = torch.nn.Module.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    try:
        from core import mylib

        B, C, H, W = 2, 4, 16, 16
        ref = torch.from_numpy(rng.standard_normal((B, C, H, W)).astype(np.float32))
        out = torch.from_numpy(rng.standard_normal((B, C, H, W)).astype(np.float32))
        pan = torch.from_numpy(rng.standard_normal((B, 1, H, W)).astype(np.float32))
        ms = torch.from_numpy(rng.standard_normal((B, C, H, W)).astype(np.float32))
        q = torch.from_numpy(rng.standard_normal((B, 8, 16)).astype(np.float32))
        k = torch.from_numpy(rng.standard_normal((B, 8, 16)).astype(np.float32))
        v = torch.from_numpy(rng.standard_normal((B, 8, 16)).astype(np.float32))
        q1 = torch.from_numpy(rng.standard_normal((B, 8, 16)).astype(np.float32))
        k1 = torch.from_numpy(rng.standard_normal((B, 8, 16)).astype(np.float32))
        v1 = torch.from_numpy(rng.standard_normal((B, 8, 16)).astype(np.float32))

        out_d = {
            "ref": ref.numpy(), "out": out.numpy(), "pan": pan.numpy(),
            "ms": ms.numpy(), "q": q.numpy(), "k": k.numpy(), "v": v.numpy(),
            "q1": q1.numpy(), "k1": k1.numpy(), "v1": v1.numpy(),
        }
        with torch.no_grad():
            out_d["loss_func1"] = mylib.loss_func1()(ref, pan, ms, out).numpy()
            out_d["loss_func2"] = mylib.loss_func2()(ref, pan, ms, out).numpy()
            out_d["loss_func8"] = mylib.loss_func8()(pan, ms, out).numpy()
            # loss_func9 is unrunnable upstream: torch's
            # cosine_embedding_loss rejects its 4-D target (mylib:676-678).
            out_d["loss_func22"] = mylib.loss_func22()(ref, out).numpy()
            out_d["loss_func6"] = mylib.loss_func6()(
                ref, pan, ms, out, q, k, v, q1, k1, v1
            ).numpy()
            out_d["sam_loss"] = mylib.SAMLoss()(ref, out).numpy()
            ll, lh, hl, hh = mylib.dwt(ref)
            out_d["dwt_ll"], out_d["dwt_lh"] = ll.numpy(), lh.numpy()
            out_d["dwt_hl"], out_d["dwt_hh"] = hl.numpy(), hh.numpy()

            torch.manual_seed(29)
            fl = mylib.FLoss(dv=C * H * W, do=32, lambd=0.005).train()
            f1 = torch.from_numpy(rng.standard_normal((8, C, H, W)).astype(np.float32))
            f2 = torch.from_numpy(rng.standard_normal((8, C, H, W)).astype(np.float32))
            out_d["floss"] = fl(f1, f2).numpy()
            out_d["floss_f1"], out_d["floss_f2"] = f1.numpy(), f2.numpy()
            out_d["floss_w1"] = fl.layer1.weight.detach().numpy()
            out_d["floss_b1"] = fl.layer1.bias.detach().numpy()
            out_d["floss_w2"] = fl.layer2.weight.detach().numpy()
            out_d["floss_b2"] = fl.layer2.bias.detach().numpy()

            # ---- r3 closure: every remaining live loss (local rng so the
            # fixtures above stay bit-identical across regeneration) --------
            r2 = np.random.default_rng(1123)

            def T(*shape):
                return torch.from_numpy(
                    r2.standard_normal(shape).astype(np.float32))

            q2, k2, v2 = T(B, 8, 16), T(B, 8, 16), T(B, 8, 16)
            out_d["q2"], out_d["k2"], out_d["v2"] = (
                q2.numpy(), k2.numpy(), v2.numpy())
            out_d["loss_func4"] = mylib.loss_func4()(
                ref, pan, ms, out, q, k, v).numpy()
            out_d["loss_func5"] = mylib.loss_func5()(
                ref, pan, ms, out, q, k, v).numpy()
            out_d["loss_func7"] = mylib.loss_func7()(
                ref, pan, ms, out, q, k, v, q2, k2, v2, q1, k1, v1).numpy()
            out_d["loss_func10"] = mylib.loss_func10()(ref, out).numpy()

            out_l, out_h = T(B, C, H, W), T(B, C, H, W)
            ms_l, pan_h = T(B, C, H, W), T(B, C, H, W)
            out_d["out_l"], out_d["out_h"] = out_l.numpy(), out_h.numpy()
            out_d["ms_l"], out_d["pan_h"] = ms_l.numpy(), pan_h.numpy()
            out_d["loss_func12"] = mylib.loss_func12()(
                out_l, out_h, ms_l, pan_h).numpy()
            out_d["loss_func13"] = mylib.loss_func13()(
                out_l, out_h, ms_l, pan_h).numpy()

            # FLoss-carrying combos: latents at three pyramid levels
            pc2, mc2 = T(8, 8, 4, 4), T(8, 8, 4, 4)            # dv=128
            pgc2, mgc2 = T(8, 24, 4, 4), T(8, 24, 4, 4)        # dv=384
            pgc1, mgc1 = T(8, 12, 8, 8), T(8, 12, 8, 8)        # dv=768
            ref8, out8 = T(8, C, H, W), T(8, C, H, W)
            for nm, t in [("pc2", pc2), ("mc2", mc2), ("pgc2", pgc2),
                          ("mgc2", mgc2), ("pgc1", pgc1), ("mgc1", mgc1),
                          ("ref8", ref8), ("out8", out8)]:
                out_d[nm] = t.numpy()
            torch.manual_seed(151)
            f15 = mylib.loss_func15(dv=128, do=16, lambd=0.005).train()
            out_d["loss_func15"] = f15(ref8, out8, pc2, mc2).numpy()
            for i, lyr in [(1, f15.cc_loss.layer1), (2, f15.cc_loss.layer2)]:
                out_d[f"f15_w{i}"] = lyr.weight.detach().numpy()
                out_d[f"f15_b{i}"] = lyr.bias.detach().numpy()
            torch.manual_seed(161)
            f16 = mylib.loss_func16(dv=128, do=16, lambd=0.005).train()
            out_d["loss_func16"] = f16(ref8, out8, pc2, mc2).numpy()
            for i, lyr in [(1, f16.cc_loss.layer1), (2, f16.cc_loss.layer2)]:
                out_d[f"f16_w{i}"] = lyr.weight.detach().numpy()
                out_d[f"f16_b{i}"] = lyr.bias.detach().numpy()
            torch.manual_seed(171)
            f17 = mylib.loss_func17(dv=128, do=16, lambd=0.005).train()
            # dv args only size the Linears; rebuild to match our latents
            f17.cc_lossh2 = mylib.FLoss(384, 16, 0.005).train()
            f17.cc_lossh1 = mylib.FLoss(768, 16, 0.005).train()
            out_d["loss_func17"] = f17(
                ref8, out8, pgc2, mgc2, pgc1, mgc1).numpy()
            for tag, fmod in [("h2", f17.cc_lossh2), ("h1", f17.cc_lossh1)]:
                out_d[f"f17_{tag}_w1"] = fmod.layer1.weight.detach().numpy()
                out_d[f"f17_{tag}_b1"] = fmod.layer1.bias.detach().numpy()
                out_d[f"f17_{tag}_w2"] = fmod.layer2.weight.detach().numpy()
                out_d[f"f17_{tag}_b2"] = fmod.layer2.bias.detach().numpy()
            torch.manual_seed(181)
            f18 = mylib.loss_func18(dv=128, do=16, lambd=0.005).train()
            f18.cc_lossl = mylib.FLoss(128, 16, 0.005).train()
            f18.cc_lossh2 = mylib.FLoss(384, 16, 0.005).train()
            f18.cc_lossh1 = mylib.FLoss(768, 16, 0.005).train()
            out_d["loss_func18"] = f18(
                ref8, out8, pc2, mc2, pgc2, mgc2, pgc1, mgc1).numpy()
            for tag, fmod in [("l", f18.cc_lossl), ("h2", f18.cc_lossh2),
                              ("h1", f18.cc_lossh1)]:
                out_d[f"f18_{tag}_w1"] = fmod.layer1.weight.detach().numpy()
                out_d[f"f18_{tag}_b1"] = fmod.layer1.bias.detach().numpy()
                out_d[f"f18_{tag}_w2"] = fmod.layer2.weight.detach().numpy()
                out_d[f"f18_{tag}_b2"] = fmod.layer2.bias.detach().numpy()

            torch.manual_seed(352)
            fl2 = mylib.FLoss2(dv=128, dv1=384, do=16, lambd=0.5).train()
            out_d["floss2"] = fl2(pc2, pgc2).numpy()
            out_d["floss2_w1"] = fl2.layer1.weight.detach().numpy()
            out_d["floss2_b1"] = fl2.layer1.bias.detach().numpy()
            out_d["floss2_w2"] = fl2.layer2.weight.detach().numpy()
            out_d["floss2_b2"] = fl2.layer2.bias.detach().numpy()
            torch.manual_seed(353)
            fl3 = mylib.FLoss3(dv=256, dv1=256, do=16, lambd=0.5).train()
            g1, g2 = T(8, 4, 8, 8), T(8, 4, 8, 8)
            out_d["floss3_f1"], out_d["floss3_f2"] = g1.numpy(), g2.numpy()
            out_d["floss3"] = fl3(g1, g2).numpy()
            for pi, seq in [(1, fl3.layer1), (2, fl3.layer2)]:
                out_d[f"floss3_p{pi}_wa"] = seq[0].weight.detach().numpy()
                out_d[f"floss3_p{pi}_ba"] = seq[0].bias.detach().numpy()
                out_d[f"floss3_p{pi}_wb"] = seq[3].weight.detach().numpy()
                out_d[f"floss3_p{pi}_bb"] = seq[3].bias.detach().numpy()

            # pyramid L1 combos + latent-correlation family
            ms2, o2 = T(B, C, 8, 8), T(B, C, 8, 8)
            ms1, o1 = T(B, C, 4, 4), T(B, C, 4, 4)
            out_d["ms2"], out_d["o2"] = ms2.numpy(), o2.numpy()
            out_d["ms1"], out_d["o1"] = ms1.numpy(), o1.numpy()
            out_d["loss_func20"] = mylib.loss_func20()(ref, out, ms2, o2).numpy()
            out_d["loss_func21"] = mylib.loss_func21()(
                ref, out, ms2, o2, ms1, o1).numpy()
            out_d["loss_func23"] = mylib.loss_func23()(ref, out, ms2, o2).numpy()

            lat = {nm: T(8, 16) for nm in
                   ["la", "lb", "l1a", "l1b", "ha", "hb",
                    "lha", "lhb", "llha", "llhb", "l3a", "l3b"]}
            for nm, t in lat.items():
                out_d["lat_" + nm] = t.numpy()
            out_d["floss4"] = mylib.FLoss4(lat["la"], lat["lb"]).numpy()
            out_d["floss5"] = mylib.FLoss5(lat["la"], lat["lb"]).numpy()
            out_d["loss_func25"] = mylib.loss_func25()(
                ref, out, lat["la"], lat["lb"], lat["ha"], lat["hb"]).numpy()
            out_d["loss_func26"] = mylib.loss_func26()(
                ref, out, lat["la"], lat["lb"], lat["ha"], lat["hb"]).numpy()
            out_d["loss_func27"] = mylib.loss_func27()(
                ref, out, lat["la"], lat["lb"], lat["ha"], lat["hb"]).numpy()
            out_d["loss_func28"] = mylib.loss_func28()(
                ref, out, lat["la"], lat["lb"]).numpy()
            out_d["loss_func29"] = mylib.loss_func29()(
                ref, out, lat["la"], lat["lb"], lat["l1a"], lat["l1b"]).numpy()
            out_d["loss_func29_h"] = mylib.loss_func29_h()(
                ref, out, lat["ha"], lat["hb"], lat["lha"], lat["lhb"]).numpy()
            out_d["loss_func29_h_3"] = mylib.loss_func29_h_3()(
                ref, out, lat["ha"], lat["hb"], lat["lha"], lat["lhb"],
                lat["llha"], lat["llhb"]).numpy()
            out_d["loss_func29_lh"] = mylib.loss_func29_lh()(
                ref, out, lat["l1a"], lat["l1b"], lat["la"], lat["lb"],
                lat["ha"], lat["hb"], lat["lha"], lat["lhb"]).numpy()
            out_d["loss_func29_c"] = mylib.loss_func29_c()(
                ref, out, lat["la"], lat["lb"], lat["l1a"], lat["l1b"]).numpy()
            out_d["loss_func29_3layer"] = mylib.loss_func29_3layer()(
                ref, out, lat["la"], lat["lb"], lat["l1a"], lat["l1b"],
                lat["l3a"], lat["l3b"]).numpy()
            out_d["loss_func29_a"] = mylib.loss_func29_a()(
                ref, out, lat["la"], lat["lb"], lat["l1a"], lat["l1b"]).numpy()
            out_d["loss_func29_1"] = mylib.loss_func29_1()(
                ref, out, lat["la"], lat["lb"], lat["l1a"], lat["l1b"]).numpy()
            out_d["loss_func30"] = mylib.loss_func30()(
                ref, out, lat["la"], lat["lb"], lat["l1a"], lat["l1b"]).numpy()
            out_d["loss_func31"] = mylib.loss_func31()(
                ref, out, lat["la"], lat["lb"], lat["l1a"], lat["l1b"],
                lat["ha"], lat["hb"], lat["lha"], lat["lhb"]).numpy()
            out_d["loss_func32"] = mylib.loss_func32()(
                ref, out, lat["ha"], lat["hb"], lat["lha"], lat["lhb"]).numpy()
        np.savez(os.path.join(OUT, "loss_zoo.npz"), **out_d)
        print("loss zoo goldens written")
    finally:
        torch.Tensor.cuda = _orig_tcuda
        torch.nn.Module.cuda = _orig_mcuda


def golden_metrics_jnp():
    """Torch metric twins (`core/metrics.py:388-503`) on random batches —
    pins eval/metrics_jnp.py. SCC uses C=1 (the torch original's 1-in-channel
    conv crashes for C>1; see metrics_jnp.py docstring).

    core/metrics.py imports skimage/sewar/scipy.ndimage.filters at module
    level; the torch twins need none of them — stub what's missing."""
    for name, attrs in [
        ("skimage", {}),
        ("skimage.metrics", {"structural_similarity": None,
                             "peak_signal_noise_ratio": None}),
        ("sewar", {}),
    ]:
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                mod = types.ModuleType(name)
                for k, v in attrs.items():
                    setattr(mod, k, v)
                sys.modules[name] = mod
    try:
        import scipy.ndimage.filters  # noqa: F401 (removed in scipy>=1.13)
    except ImportError:
        import scipy.ndimage as _ndi

        _f = types.ModuleType("scipy.ndimage.filters")
        _f.sobel, _f.convolve = _ndi.sobel, _ndi.convolve
        sys.modules["scipy.ndimage.filters"] = _f
    from core import metrics as RM

    r2 = np.random.default_rng(388)

    def T(*shape):
        return torch.from_numpy(r2.standard_normal(shape).astype(np.float32))

    N, C, H, W = 3, 4, 32, 32
    xt, xp = T(N, C, H, W), T(N, C, H, W)
    x1, y1 = T(N, 1, H, W), T(N, 1, H, W)
    a, b = T(N, H, W), T(N, H, W)
    # l_ms lives at the LOW resolution (matches l_pan — QIndex multiplies
    # elementwise); ps/pan at full resolution
    lms, ps = torch.rand(N, C, H // 4, W // 4), torch.rand(N, C, H, W)
    pan, lpan = torch.rand(N, 1, H, W), torch.rand(N, 1, H // 4, W // 4)
    out = {
        "xt": xt.numpy(), "xp": xp.numpy(),
        "x1": x1.numpy(), "y1": y1.numpy(),
        "a": a.numpy(), "b": b.numpy(),
        "lms": lms.numpy(), "ps": ps.numpy(),
        "pan": pan.numpy(), "lpan": lpan.numpy(),
        "sam": RM.SAM_torch(xt, xp).numpy(),
        "scc": RM.SCC_torch(x1, y1).numpy(),
        "qindex": RM.QIndex_torch(a, b).numpy(),
        "d_lambda": RM.D_lambda_torch(lms, ps).numpy(),
        "d_s": RM.D_s_torch(lms, pan, lpan, ps).numpy(),
    }
    np.savez(os.path.join(OUT, "metrics_jnp.npz"), **out)
    print("metrics_jnp goldens written")


def golden_pgcu():
    """Reference PGCU forward + full state dict for transplant."""
    from utils.PGCU import PGCU

    torch.manual_seed(17)
    m = PGCU(Channel=4, VecLen=128, NumberBlocks=3)
    m.eval()
    pan = torch.from_numpy(rng.standard_normal((1, 1, 64, 64)).astype(np.float32))
    ms = torch.from_numpy(rng.standard_normal((1, 4, 16, 16)).astype(np.float32))
    with torch.no_grad():
        y = m(pan, ms)
    np.savez(
        os.path.join(OUT, "pgcu.npz"),
        pan=pan.numpy(), ms=ms.numpy(), y=y.numpy(),
        **{"sd." + k: v.numpy() for k, v in m.state_dict().items()},
    )
    print("pgcu goldens written; out", y.shape)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default=None,
                    help="run a single golden_<name> generator")
    only = ap.parse_args().only
    if only:
        globals()[f"golden_{only}"]()
        raise SystemExit(0)
    golden_dwt()
    golden_schedules()
    golden_gamma_embedding()
    golden_modulated_conv()
    golden_wavbest()
    golden_pipeline()
    golden_dpm_solver()
    golden_dynamic_conv()
    golden_kernel_adaption()
    golden_unet_legacy()
    golden_attention()
    golden_attnpp()
    golden_orphan_blocks()
    golden_loss_zoo()
    golden_metrics_jnp()
    golden_pgcu()
