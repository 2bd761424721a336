"""DPM-Solver / DPM-Solver++ for JAX, built scan-first for XLA.

Re-derivation of the solver subset exercised by the reference
(`/root/reference/GeneralModel/diffusion_general.py:227-335` driving the
vendored official implementation in `core/dpm_solver_pytorch.py`):

  * discrete-schedule `NoiseScheduleVP` (piecewise-linear log ᾱ ↔ t ↔ λ),
  * model types noise / x_start / v / score, uncond + classifier-free
    guidance (`model_wrapper`, `dpm_solver_pytorch.py:184-348`),
  * algorithm types dpmsolver++ (data prediction) and dpmsolver (noise
    prediction), solver types 'dpmsolver' and 'taylor',
  * singlestep orders 1-3 (DPM-Solver-fast order schedule,
    `:497-555, 1259-1279`), multistep orders 1-3 with `lower_order_final`
    (`:1215-1258`), singlestep_fixed, denoise-to-zero, dynamic thresholding
    (quantile 0.995, `:430-439`),
  * adaptive step size (`dpm_solver_adaptive:982-1044`) as ONE traced
    `lax.while_loop`, `add_noise` (`:1045-1063`) and ODE inversion
    (`inverse:1065-1079`).

TPU-first structure: every time grid, λ value and update coefficient is a
*static* numpy scalar computed at trace time — the compiled program contains
only model evaluations and fused linear combinations. Uniform-order runs of
steps execute as `lax.scan` over stacked coefficient tables (one compiled
body regardless of step count); the short warm-up/tail ramps are unrolled.

Exact-arithmetic shortcut: for an x_start model under dpmsolver++ the
noise-conversion round-trip (x0 → ε̂ → x0) cancels algebraically; we skip it
to avoid catastrophic cancellation as σ_t → 0 (the reference composes
`model_wrapper` x_start→noise with `data_prediction_fn` noise→x0,
`dpm_solver_pytorch.py:296-312, 447-456`).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class NoiseScheduleVP:
    """VP-SDE noise schedule in continuous time t ∈ (0, T].

    Discrete mode: log ᾱ(t) is the piecewise-linear interpolant of
    0.5·log(ᾱ_i) over t_i = (i+1)/N (`dpm_solver_pytorch.py:99-106`).
    All math is float64 numpy — these run at trace time only.
    """

    def __init__(self, schedule: str = "discrete", betas: Optional[np.ndarray] = None,
                 continuous_beta_0: float = 0.1, continuous_beta_1: float = 20.0):
        self.schedule = schedule
        if schedule == "discrete":
            assert betas is not None
            betas = np.asarray(betas, dtype=np.float64)
            log_alphas = 0.5 * np.cumsum(np.log(1.0 - betas))
            self.total_N = len(log_alphas)
            self.T = 1.0
            self.t_array = np.linspace(0.0, 1.0, self.total_N + 1)[1:]
            self.log_alpha_array = log_alphas
        elif schedule == "linear":
            self.total_N = 1000
            self.T = 1.0
            self.beta_0 = continuous_beta_0
            self.beta_1 = continuous_beta_1
        else:
            raise NotImplementedError(schedule)

    def marginal_log_mean_coeff(self, t):
        t = np.asarray(t, dtype=np.float64)
        if self.schedule == "discrete":
            return np.interp(t, self.t_array, self.log_alpha_array)
        return -0.25 * t**2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0

    def marginal_alpha(self, t):
        return np.exp(self.marginal_log_mean_coeff(t))

    def marginal_std(self, t):
        return np.sqrt(1.0 - np.exp(2.0 * self.marginal_log_mean_coeff(t)))

    def marginal_lambda(self, t):
        log_mean = self.marginal_log_mean_coeff(t)
        return log_mean - 0.5 * np.log(1.0 - np.exp(2.0 * log_mean))

    def inverse_lambda(self, lamb):
        lamb = np.asarray(lamb, dtype=np.float64)
        if self.schedule == "discrete":
            log_alpha = -0.5 * np.logaddexp(0.0, -2.0 * lamb)
            # log_alpha_array decreases with t; reverse for np.interp.
            return np.interp(
                log_alpha, self.log_alpha_array[::-1], self.t_array[::-1]
            )
        tmp = 2.0 * (self.beta_1 - self.beta_0) * np.logaddexp(-2.0 * lamb, 0.0)
        return (
            2.0 * tmp / (np.sqrt(self.beta_0**2 + tmp) + self.beta_0)
        ) / (self.beta_1 - self.beta_0)

    def model_input_time(self, t):
        """Continuous t → discrete model input label (`dpm_solver_pytorch.py:288-295`)."""
        if self.schedule == "discrete":
            return (np.asarray(t, dtype=np.float64) - 1.0 / self.total_N) * 1000.0
        return t


class _TracedScheduleVP:
    """jnp twin of :class:`NoiseScheduleVP` for *data-dependent* time — the
    adaptive solver's step sizes are runtime values, so its schedule lookups
    must be traced (everywhere else they are trace-time numpy)."""

    def __init__(self, ns: "NoiseScheduleVP"):
        self.schedule = ns.schedule
        self.total_N = ns.total_N
        if ns.schedule == "discrete":
            self.t_array = jnp.asarray(ns.t_array)
            self.log_alpha_array = jnp.asarray(ns.log_alpha_array)
        else:
            self.beta_0, self.beta_1 = ns.beta_0, ns.beta_1

    def log_alpha(self, t):
        if self.schedule == "discrete":
            return jnp.interp(t, self.t_array, self.log_alpha_array)
        return -0.25 * t**2 * (self.beta_1 - self.beta_0) - 0.5 * t * self.beta_0

    def alpha(self, t):
        return jnp.exp(self.log_alpha(t))

    def std(self, t):
        return jnp.sqrt(1.0 - jnp.exp(2.0 * self.log_alpha(t)))

    def lam(self, t):
        la = self.log_alpha(t)
        return la - 0.5 * jnp.log(1.0 - jnp.exp(2.0 * la))

    def inverse_lambda(self, lamb):
        if self.schedule == "discrete":
            log_alpha = -0.5 * jnp.logaddexp(0.0, -2.0 * lamb)
            return jnp.interp(
                log_alpha, self.log_alpha_array[::-1], self.t_array[::-1]
            )
        tmp = 2.0 * (self.beta_1 - self.beta_0) * jnp.logaddexp(-2.0 * lamb, 0.0)
        return (
            2.0 * tmp / (jnp.sqrt(self.beta_0**2 + tmp) + self.beta_0)
        ) / (self.beta_1 - self.beta_0)

    def model_input_time(self, t):
        if self.schedule == "discrete":
            return (t - 1.0 / self.total_N) * 1000.0
        return t


def dynamic_thresholding(x0, ratio: float = 0.995, max_val: float = 1.0):
    """Imagen-style per-sample quantile clamp (`dpm_solver_pytorch.py:430-439`)."""
    b = x0.shape[0]
    s = jnp.quantile(jnp.abs(x0.reshape(b, -1)), ratio, axis=1)
    s = jnp.maximum(s, max_val).reshape((b,) + (1,) * (x0.ndim - 1))
    return jnp.clip(x0, -s, s) / s


@dataclasses.dataclass
class WrappedModel:
    """Model-type conversion + guidance, usable with static *or* traced
    alpha/sigma (so the same code serves unrolled steps and scan bodies).

    `model(x, t_input)` for uncond; `model(x, t_input, cond)` under
    classifier-free guidance (`model_wrapper`, `dpm_solver_pytorch.py:296-344`).
    """

    model: Callable
    model_type: str = "x_start"
    guidance_type: str = "uncond"
    guidance_scale: float = 1.0
    condition: Optional[jnp.ndarray] = None
    unconditional_condition: Optional[jnp.ndarray] = None

    def __post_init__(self):
        assert self.model_type in ("noise", "x_start", "v", "score")
        assert self.guidance_type in ("uncond", "classifier-free")

    def _cfg_active(self):
        # Must be decidable at trace time: guidance_scale may be a traced
        # scalar (one compiled sampler serves every guidance value — a sweep
        # costs one compile). A traced scale counts as active; at runtime
        # value 1.0 the combination degenerates to the conditional branch
        # (uncond + 1·(cond − uncond) = cond), so semantics are unchanged.
        if (self.guidance_type != "classifier-free"
                or self.unconditional_condition is None):
            return False
        static = isinstance(self.guidance_scale, (int, float))
        return not (static and self.guidance_scale == 1.0)

    def _raw(self, x, t_input):
        if self.guidance_type == "uncond":
            return self.model(x, t_input)
        return self.model(x, t_input, self.condition)

    def noise(self, x, t_input, alpha_t, sigma_t):
        """ε̂ prediction (with CFG combination in noise space, as reference)."""
        if self._cfg_active():
            x2 = jnp.concatenate([x, x])
            t2 = jnp.concatenate([t_input, t_input])
            # Conditions may be arrays or pytrees (e.g. cached cond features).
            c2 = jax.tree.map(
                lambda u, c: jnp.concatenate([u, c]),
                self.unconditional_condition, self.condition,
            )
            out = self.model(x2, t2, c2)
            uncond, cond = jnp.split(self._to_noise(x2, out, alpha_t, sigma_t), 2)
            # scalar or per-sample (B,) guidance — the latter lets one batch
            # mix requests at different scales (serving co-batching)
            gs = self.guidance_scale
            if jnp.ndim(gs) > 0:
                gs = jnp.reshape(gs, (-1,) + (1,) * (x.ndim - 1))
            return uncond + gs * (cond - uncond)
        return self._to_noise(x, self._raw(x, t_input), alpha_t, sigma_t)

    def _to_noise(self, x, out, alpha_t, sigma_t):
        if self.model_type == "noise":
            return out
        if self.model_type == "x_start":
            return (x - alpha_t * out) / sigma_t
        if self.model_type == "v":
            return alpha_t * out + sigma_t * x
        return -sigma_t * out  # score

    def x0(self, x, t_input, alpha_t, sigma_t):
        """x̂0 prediction. Direct conversions avoid the ε̂ round-trip except
        under CFG, where the combination is defined in noise space."""
        if self._cfg_active():
            eps = self.noise(x, t_input, alpha_t, sigma_t)
            return (x - sigma_t * eps) / alpha_t
        out = self._raw(x, t_input)
        if self.model_type == "x_start":
            return out
        if self.model_type == "noise":
            return (x - sigma_t * out) / alpha_t
        if self.model_type == "v":
            return alpha_t * x - sigma_t * out
        return (x + sigma_t**2 * out) / alpha_t  # score


def wrap_model(model, ns=None, model_type="x_start", guidance_type="uncond",
               guidance_scale=1.0, condition=None, unconditional_condition=None,
               model_kwargs=None):
    """Convenience mirroring the reference `model_wrapper` call shape."""
    if model_kwargs:
        base = model
        model = lambda x, t, *cond: base(x, t, *cond, **model_kwargs)
    return WrappedModel(
        model=model,
        model_type=model_type,
        guidance_type=guidance_type,
        guidance_scale=guidance_scale,
        condition=condition,
        unconditional_condition=unconditional_condition,
    )


@dataclasses.dataclass
class DPMSolver:
    """Functional DPM-Solver over a :class:`WrappedModel`."""

    wrapped: WrappedModel
    ns: NoiseScheduleVP
    algorithm_type: str = "dpmsolver++"
    correcting_x0_fn: Optional[str] = "dynamic_thresholding"
    thresholding_ratio: float = 0.995
    thresholding_max_val: float = 1.0
    solver_type: str = "dpmsolver"

    def _correct_x0(self, x0):
        if self.correcting_x0_fn is None:
            return x0
        if self.correcting_x0_fn == "dynamic_thresholding":
            return dynamic_thresholding(
                x0, self.thresholding_ratio, self.thresholding_max_val
            )
        raise NotImplementedError(self.correcting_x0_fn)

    def _eval_with(self, x, t_input, alpha_t, sigma_t):
        """Model evaluation: x̂0 + corrector under dpmsolver++
        (`data_prediction_fn:447-456`), ε̂ under dpmsolver. Coefficients may
        be static floats or traced scalars (scan bodies)."""
        if self.algorithm_type == "dpmsolver++":
            return self._correct_x0(self.wrapped.x0(x, t_input, alpha_t, sigma_t))
        return self.wrapped.noise(x, t_input, alpha_t, sigma_t)

    def _eval(self, x, t: float):
        t_input = jnp.full((x.shape[0],), float(self.ns.model_input_time(t)))
        return self._eval_with(
            x, t_input, float(self.ns.marginal_alpha(t)), float(self.ns.marginal_std(t))
        )

    def _x0_pred(self, x, t: float):
        t_input = jnp.full((x.shape[0],), float(self.ns.model_input_time(t)))
        return self._correct_x0(
            self.wrapped.x0(
                x, t_input, float(self.ns.marginal_alpha(t)), float(self.ns.marginal_std(t))
            )
        )

    # -- static coefficient helpers (numpy, trace time) ---------------------

    def _lam(self, t):
        return float(self.ns.marginal_lambda(t))

    def _alpha(self, t):
        return float(self.ns.marginal_alpha(t))

    def _sigma(self, t):
        return float(self.ns.marginal_std(t))

    # -- updates ------------------------------------------------------------

    def _first_update(self, x, s, t, model_s):
        """DPM-Solver-1 / DDIM (`dpm_solver_first_update:563-609`)."""
        h = self._lam(t) - self._lam(s)
        if self.algorithm_type == "dpmsolver++":
            return (self._sigma(t) / self._sigma(s)) * x - (
                self._alpha(t) * math.expm1(-h)
            ) * model_s
        return (self._alpha(t) / self._alpha(s)) * x - (
            self._sigma(t) * math.expm1(h)
        ) * model_s

    def _singlestep_update(self, x, s, t, order: int, r1=None, r2=None):
        """Singlestep order-k update with k model evaluations
        (`:610-816`). r1/r2 are the intermediate λ ratios."""
        if order == 1:
            return self._first_update(x, s, t, self._eval(x, s))
        lam_s, lam_t = self._lam(s), self._lam(t)
        h = lam_t - lam_s
        if order == 2:
            r1 = 0.5 if r1 is None else r1
            s1 = float(self.ns.inverse_lambda(lam_s + r1 * h))
            model_s = self._eval(x, s)
            if self.algorithm_type == "dpmsolver++":
                phi_11, phi_1 = math.expm1(-r1 * h), math.expm1(-h)
                x_s1 = (self._sigma(s1) / self._sigma(s)) * x - (
                    self._alpha(s1) * phi_11
                ) * model_s
                model_s1 = self._eval(x_s1, s1)
                base = (self._sigma(t) / self._sigma(s)) * x - (
                    self._alpha(t) * phi_1
                ) * model_s
                if self.solver_type == "dpmsolver":
                    return base - (0.5 / r1) * (self._alpha(t) * phi_1) * (
                        model_s1 - model_s
                    )
                return base + (1.0 / r1) * (
                    self._alpha(t) * (phi_1 / h + 1.0)
                ) * (model_s1 - model_s)
            phi_11, phi_1 = math.expm1(r1 * h), math.expm1(h)
            x_s1 = (self._alpha(s1) / self._alpha(s)) * x - (
                self._sigma(s1) * phi_11
            ) * model_s
            model_s1 = self._eval(x_s1, s1)
            base = (self._alpha(t) / self._alpha(s)) * x - (
                self._sigma(t) * phi_1
            ) * model_s
            if self.solver_type == "dpmsolver":
                return base - (0.5 / r1) * (self._sigma(t) * phi_1) * (
                    model_s1 - model_s
                )
            return base - (1.0 / r1) * (
                self._sigma(t) * (phi_1 / h - 1.0)
            ) * (model_s1 - model_s)
        # order == 3
        r1 = 1.0 / 3.0 if r1 is None else r1
        r2 = 2.0 / 3.0 if r2 is None else r2
        s1 = float(self.ns.inverse_lambda(lam_s + r1 * h))
        s2 = float(self.ns.inverse_lambda(lam_s + r2 * h))
        model_s = self._eval(x, s)
        if self.algorithm_type == "dpmsolver++":
            phi_11 = math.expm1(-r1 * h)
            phi_12 = math.expm1(-r2 * h)
            phi_1 = math.expm1(-h)
            phi_22 = math.expm1(-r2 * h) / (r2 * h) + 1.0
            phi_2 = phi_1 / h + 1.0
            phi_3 = phi_2 / h - 0.5
            x_s1 = (self._sigma(s1) / self._sigma(s)) * x - (
                self._alpha(s1) * phi_11
            ) * model_s
            model_s1 = self._eval(x_s1, s1)
            x_s2 = (
                (self._sigma(s2) / self._sigma(s)) * x
                - (self._alpha(s2) * phi_12) * model_s
                + (r2 / r1) * (self._alpha(s2) * phi_22) * (model_s1 - model_s)
            )
            model_s2 = self._eval(x_s2, s2)
            if self.solver_type == "dpmsolver":
                return (
                    (self._sigma(t) / self._sigma(s)) * x
                    - (self._alpha(t) * phi_1) * model_s
                    + (1.0 / r2) * (self._alpha(t) * phi_2) * (model_s2 - model_s)
                )
            d1_0 = (1.0 / r1) * (model_s1 - model_s)
            d1_1 = (1.0 / r2) * (model_s2 - model_s)
            d1 = (r2 * d1_0 - r1 * d1_1) / (r2 - r1)
            d2 = 2.0 * (d1_1 - d1_0) / (r2 - r1)
            return (
                (self._sigma(t) / self._sigma(s)) * x
                - (self._alpha(t) * phi_1) * model_s
                + (self._alpha(t) * phi_2) * d1
                - (self._alpha(t) * phi_3) * d2
            )
        phi_11 = math.expm1(r1 * h)
        phi_12 = math.expm1(r2 * h)
        phi_1 = math.expm1(h)
        phi_22 = math.expm1(r2 * h) / (r2 * h) - 1.0
        phi_2 = phi_1 / h - 1.0
        phi_3 = phi_2 / h - 0.5
        x_s1 = (self._alpha(s1) / self._alpha(s)) * x - (
            self._sigma(s1) * phi_11
        ) * model_s
        model_s1 = self._eval(x_s1, s1)
        x_s2 = (
            (self._alpha(s2) / self._alpha(s)) * x
            - (self._sigma(s2) * phi_12) * model_s
            - (r2 / r1) * (self._sigma(s2) * phi_22) * (model_s1 - model_s)
        )
        model_s2 = self._eval(x_s2, s2)
        if self.solver_type == "dpmsolver":
            return (
                (self._alpha(t) / self._alpha(s)) * x
                - (self._sigma(t) * phi_1) * model_s
                - (1.0 / r2) * (self._sigma(t) * phi_2) * (model_s2 - model_s)
            )
        d1_0 = (1.0 / r1) * (model_s1 - model_s)
        d1_1 = (1.0 / r2) * (model_s2 - model_s)
        d1 = (r2 * d1_0 - r1 * d1_1) / (r2 - r1)
        d2 = 2.0 * (d1_1 - d1_0) / (r2 - r1)
        return (
            (self._alpha(t) / self._alpha(s)) * x
            - (self._sigma(t) * phi_1) * model_s
            - (self._sigma(t) * phi_2) * d1
            - (self._sigma(t) * phi_3) * d2
        )

    def _multistep_update(self, x, model_prev: Sequence, t_prev: Sequence, t, order):
        """Multistep order-k update reusing cached model values (`:817-928`)."""
        if order == 1:
            return self._first_update(x, t_prev[-1], t, model_prev[-1])
        lam = [self._lam(tp) for tp in t_prev] + [self._lam(t)]
        t0 = t_prev[-1]
        if order == 2:
            h0 = lam[-2] - lam[-3]
            h = lam[-1] - lam[-2]
            r0 = h0 / h
            d1_0 = (1.0 / r0) * (model_prev[-1] - model_prev[-2])
            if self.algorithm_type == "dpmsolver++":
                phi_1 = math.expm1(-h)
                base = (self._sigma(t) / self._sigma(t0)) * x - (
                    self._alpha(t) * phi_1
                ) * model_prev[-1]
                if self.solver_type == "dpmsolver":
                    return base - 0.5 * (self._alpha(t) * phi_1) * d1_0
                return base + (self._alpha(t) * (phi_1 / h + 1.0)) * d1_0
            phi_1 = math.expm1(h)
            base = (self._alpha(t) / self._alpha(t0)) * x - (
                self._sigma(t) * phi_1
            ) * model_prev[-1]
            if self.solver_type == "dpmsolver":
                return base - 0.5 * (self._sigma(t) * phi_1) * d1_0
            return base - (self._sigma(t) * (phi_1 / h - 1.0)) * d1_0
        # order == 3
        h1 = lam[-3] - lam[-4]
        h0 = lam[-2] - lam[-3]
        h = lam[-1] - lam[-2]
        r0, r1 = h0 / h, h1 / h
        d1_0 = (1.0 / r0) * (model_prev[-1] - model_prev[-2])
        d1_1 = (1.0 / r1) * (model_prev[-2] - model_prev[-3])
        d1 = d1_0 + (r0 / (r0 + r1)) * (d1_0 - d1_1)
        d2 = (1.0 / (r0 + r1)) * (d1_0 - d1_1)
        if self.algorithm_type == "dpmsolver++":
            phi_1 = math.expm1(-h)
            phi_2 = phi_1 / h + 1.0
            phi_3 = phi_2 / h - 0.5
            return (
                (self._sigma(t) / self._sigma(t0)) * x
                - (self._alpha(t) * phi_1) * model_prev[-1]
                + (self._alpha(t) * phi_2) * d1
                - (self._alpha(t) * phi_3) * d2
            )
        phi_1 = math.expm1(h)
        phi_2 = phi_1 / h - 1.0
        phi_3 = phi_2 / h - 0.5
        return (
            (self._alpha(t) / self._alpha(t0)) * x
            - (self._sigma(t) * phi_1) * model_prev[-1]
            - (self._sigma(t) * phi_2) * d1
            - (self._sigma(t) * phi_3) * d2
        )

    # -- time grids (numpy, static) -----------------------------------------

    def get_time_steps(self, skip_type, t_T, t_0, n):
        if skip_type == "logSNR":
            lam_T = self.ns.marginal_lambda(t_T)
            lam_0 = self.ns.marginal_lambda(t_0)
            return self.ns.inverse_lambda(np.linspace(lam_T, lam_0, n + 1))
        if skip_type == "time_uniform":
            return np.linspace(t_T, t_0, n + 1)
        if skip_type == "time_quadratic":
            return np.linspace(t_T**0.5, t_0**0.5, n + 1) ** 2
        raise ValueError(skip_type)

    def _singlestep_orders(self, steps, order):
        """DPM-Solver-fast order schedule (`:497-555`)."""
        if order == 3:
            k = steps // 3 + 1
            if steps % 3 == 0:
                return [3] * (k - 2) + [2, 1]
            if steps % 3 == 1:
                return [3] * (k - 1) + [1]
            return [3] * (k - 1) + [2]
        if order == 2:
            if steps % 2 == 0:
                return [2] * (steps // 2)
            return [2] * (steps // 2) + [1]
        return [1] * steps

    # -- drivers -------------------------------------------------------------

    def sample(
        self,
        x,
        steps: int = 20,
        order: int = 3,
        skip_type: str = "time_uniform",
        method: str = "multistep",
        t_start: Optional[float] = None,
        t_end: Optional[float] = None,
        lower_order_final: bool = True,
        denoise_to_zero: bool = False,
    ):
        """Run the solver. All control flow is static; jit-compatible."""
        t_0 = 1.0 / self.ns.total_N if t_end is None else t_end
        t_T = self.ns.T if t_start is None else t_start

        if method == "multistep":
            x = self._sample_multistep(
                x, steps, order, skip_type, t_T, t_0, lower_order_final
            )
        elif method in ("singlestep", "singlestep_fixed"):
            x = self._sample_singlestep(
                x, steps, order, skip_type, t_T, t_0, fixed=method == "singlestep_fixed"
            )
        elif method == "adaptive":
            x = self.sample_adaptive(x, order=order, t_start=t_T, t_end=t_0)
        else:
            raise ValueError(method)
        if denoise_to_zero:
            x = self._x0_pred(x, t_0)
        return x

    def add_noise(self, x, t, noise=None, rng=None):
        """xt = α_t·x + σ_t·noise for a batch of times t
        (`dpm_solver_pytorch.py:1045-1063`): returns (t_size, B, *shape), or
        (B, *shape) when t has a single element."""
        t = np.atleast_1d(np.asarray(t, dtype=np.float64))
        alpha = jnp.asarray(self.ns.marginal_alpha(t), x.dtype)
        sigma = jnp.asarray(self.ns.marginal_std(t), x.dtype)
        if noise is None:
            noise = jax.random.normal(
                rng if rng is not None else jax.random.key(0),
                (t.shape[0], *x.shape), x.dtype,
            )
        expand = (-1,) + (1,) * x.ndim
        xt = alpha.reshape(expand) * x[None] + sigma.reshape(expand) * noise
        return xt[0] if t.shape[0] == 1 else xt

    def inverse(self, x, steps: int = 20, t_start: Optional[float] = None,
                t_end: Optional[float] = None, order: int = 2,
                skip_type: str = "time_uniform", method: str = "multistep",
                lower_order_final: bool = True, denoise_to_zero: bool = False):
        """Integrate the diffusion ODE *forward* (data → noise), i.e. run the
        same solver from t_start=1/N to t_end=T
        (`dpm_solver_pytorch.py:1065-1079`). The update formulas are signless
        in h, so the machinery is reused verbatim."""
        t_0 = 1.0 / self.ns.total_N if t_start is None else t_start
        t_T = self.ns.T if t_end is None else t_end
        assert t_0 > 0 and t_T > 0
        return self.sample(
            x, steps=steps, t_start=t_0, t_end=t_T, order=order,
            skip_type=skip_type, method=method,
            lower_order_final=lower_order_final,
            denoise_to_zero=denoise_to_zero,
        )

    # -- adaptive step size (traced: one jit-able lax.while_loop) ------------

    def _traced_eval(self, tsch, x, t):
        t_input = jnp.full((x.shape[0],), tsch.model_input_time(t), x.dtype)
        return self._eval_with(x, t_input, tsch.alpha(t), tsch.std(t))

    def _traced_first(self, tsch, x, s, t, model_s):
        h = tsch.lam(t) - tsch.lam(s)
        if self.algorithm_type == "dpmsolver++":
            return (tsch.std(t) / tsch.std(s)) * x - (
                tsch.alpha(t) * jnp.expm1(-h)
            ) * model_s
        return (tsch.alpha(t) / tsch.alpha(s)) * x - (
            tsch.std(t) * jnp.expm1(h)
        ) * model_s

    def _traced_second(self, tsch, x, s, t, model_s, r1=0.5):
        """Returns (x_t, model_s1) so the third update can reuse the eval
        (the reference's `return_intermediate` plumbing, `:610-692`)."""
        lam_s = tsch.lam(s)
        h = tsch.lam(t) - lam_s
        s1 = tsch.inverse_lambda(lam_s + r1 * h)
        if self.algorithm_type == "dpmsolver++":
            phi_11, phi_1 = jnp.expm1(-r1 * h), jnp.expm1(-h)
            x_s1 = (tsch.std(s1) / tsch.std(s)) * x - (
                tsch.alpha(s1) * phi_11
            ) * model_s
            model_s1 = self._traced_eval(tsch, x_s1, s1)
            x_t = (
                (tsch.std(t) / tsch.std(s)) * x
                - (tsch.alpha(t) * phi_1) * model_s
                - (0.5 / r1) * (tsch.alpha(t) * phi_1) * (model_s1 - model_s)
            )
        else:
            phi_11, phi_1 = jnp.expm1(r1 * h), jnp.expm1(h)
            x_s1 = (tsch.alpha(s1) / tsch.alpha(s)) * x - (
                tsch.std(s1) * phi_11
            ) * model_s
            model_s1 = self._traced_eval(tsch, x_s1, s1)
            x_t = (
                (tsch.alpha(t) / tsch.alpha(s)) * x
                - (tsch.std(t) * phi_1) * model_s
                - (0.5 / r1) * (tsch.std(t) * phi_1) * (model_s1 - model_s)
            )
        return x_t, model_s1

    def _traced_third(self, tsch, x, s, t, model_s, model_s1,
                      r1=1.0 / 3.0, r2=2.0 / 3.0):
        lam_s = tsch.lam(s)
        h = tsch.lam(t) - lam_s
        s2 = tsch.inverse_lambda(lam_s + r2 * h)
        if self.algorithm_type == "dpmsolver++":
            phi_12, phi_1 = jnp.expm1(-r2 * h), jnp.expm1(-h)
            phi_22 = jnp.expm1(-r2 * h) / (r2 * h) + 1.0
            phi_2 = phi_1 / h + 1.0
            x_s2 = (
                (tsch.std(s2) / tsch.std(s)) * x
                - (tsch.alpha(s2) * phi_12) * model_s
                + (r2 / r1) * (tsch.alpha(s2) * phi_22) * (model_s1 - model_s)
            )
            model_s2 = self._traced_eval(tsch, x_s2, s2)
            return (
                (tsch.std(t) / tsch.std(s)) * x
                - (tsch.alpha(t) * phi_1) * model_s
                + (1.0 / r2) * (tsch.alpha(t) * phi_2) * (model_s2 - model_s)
            )
        phi_12, phi_1 = jnp.expm1(r2 * h), jnp.expm1(h)
        phi_22 = jnp.expm1(r2 * h) / (r2 * h) - 1.0
        phi_2 = phi_1 / h - 1.0
        x_s2 = (
            (tsch.alpha(s2) / tsch.alpha(s)) * x
            - (tsch.std(s2) * phi_12) * model_s
            - (r2 / r1) * (tsch.std(s2) * phi_22) * (model_s1 - model_s)
        )
        model_s2 = self._traced_eval(tsch, x_s2, s2)
        return (
            (tsch.alpha(t) / tsch.alpha(s)) * x
            - (tsch.std(t) * phi_1) * model_s
            - (1.0 / r2) * (tsch.std(t) * phi_2) * (model_s2 - model_s)
        )

    def _adaptive_loop_fns(self, order, t_0, tsch, h_init, atol, rtol,
                           theta, t_err):
        """Build the (cond-maker, body) pair of the adaptive `while_loop`.

        Carry: (x, x_prev, s, h, n, n_acc). The cond is parameterised by a
        *traced* loop bound so the chunked driver can reuse one compiled
        segment for every continuation."""
        lambda_0 = tsch.lam(jnp.float32(t_0))

        def lower_and_higher(x, s, t):
            model_s = self._traced_eval(tsch, x, s)
            if order == 2:
                x_lower = self._traced_first(tsch, x, s, t, model_s)
                x_higher, _ = self._traced_second(tsch, x, s, t, model_s, r1=0.5)
            else:
                x_lower, model_s1 = self._traced_second(
                    tsch, x, s, t, model_s, r1=1.0 / 3.0
                )
                x_higher = self._traced_third(
                    tsch, x, s, t, model_s, model_s1, r1=1.0 / 3.0, r2=2.0 / 3.0
                )
            return x_lower, x_higher

        def make_cond(loop_bound):
            def cond(carry):
                x, x_prev, s, h, n, n_acc = carry
                return (jnp.abs(s - t_0) > t_err) & (n < loop_bound)
            return cond

        def body(carry):
            x, x_prev, s, h, n, n_acc = carry
            lambda_s = tsch.lam(s)
            t = tsch.inverse_lambda(lambda_s + h)
            x_lower, x_higher = lower_and_higher(x, s, t)
            delta = jnp.maximum(
                atol, rtol * jnp.maximum(jnp.abs(x_lower), jnp.abs(x_prev))
            )
            b = x.shape[0]
            E = jnp.max(jnp.sqrt(jnp.mean(
                jnp.square((x_higher - x_lower) / delta).reshape(b, -1), axis=1
            )))
            accept = E <= 1.0
            x = jnp.where(accept, x_higher, x)
            x_prev = jnp.where(accept, x_lower, x_prev)
            s = jnp.where(accept, t, s)
            h = jnp.minimum(
                theta * h * E ** (-1.0 / order), lambda_0 - tsch.lam(s)
            )
            return x, x_prev, s, h, n + 1, n_acc + accept.astype(jnp.int32)

        return make_cond, body

    def sample_adaptive(self, x, order: int = 3,
                        t_start: Optional[float] = None,
                        t_end: Optional[float] = None,
                        h_init: float = 0.05, atol: float = 0.0078,
                        rtol: float = 0.05, theta: float = 0.9,
                        t_err: float = 1e-5, max_loops: int = 128,
                        return_stats: bool = False):
        """Adaptive step-size singlestep solver
        (`dpm_solver_adaptive:982-1044`): embedded order-(k−1)/k error
        estimate, step accepted when the rms of (x_hi−x_lo)/δ ≤ 1, logSNR
        step h ← min(θ·h·E^(−1/order), λ_0−λ_s).

        TPU-native: the whole loop is ONE `lax.while_loop` with traced time/
        step-size state — no host round-trips, compiles once ('dpmsolver'
        solver type, orders 2/3, like the reference). `max_loops` bounds
        runaway rejection loops (the reference loops unboundedly). The
        default is a deployment-safe 128 (~2 min worst-case device dispatch
        at flagship shapes; typical runs accept well under that —
        BASELINE.md r4 adaptive row): an unbounded-feeling 500 cap makes the
        worst case one 4+ minute dispatch, which crashed the stdio-relay's
        TPU worker outright (r4). Need a bigger budget on a fragile
        transport? Use :meth:`sample_adaptive_chunked`, which reaches any
        `max_loops` in bounded dispatches."""
        assert order in (2, 3), "adaptive solver supports order 2 or 3"
        t_0 = 1.0 / self.ns.total_N if t_end is None else t_end
        t_T = self.ns.T if t_start is None else t_start
        tsch = _TracedScheduleVP(self.ns)
        make_cond, body = self._adaptive_loop_fns(
            order, t_0, tsch, h_init, atol, rtol, theta, t_err)

        s0 = jnp.float32(t_T)
        h0 = jnp.float32(h_init)
        x, _, _, _, n, n_acc = jax.lax.while_loop(
            make_cond(max_loops), body,
            (x, x, s0, h0, jnp.int32(0), jnp.int32(0))
        )
        if return_stats:
            # NFE = n·order model evals; accepted/attempted step counts are
            # traced scalars — the benchmark row the r3 VERDICT asked for
            return x, {"steps_attempted": n, "steps_accepted": n_acc}
        return x

    def sample_adaptive_chunked(self, x, order: int = 3,
                                t_start: Optional[float] = None,
                                t_end: Optional[float] = None,
                                h_init: float = 0.05, atol: float = 0.0078,
                                rtol: float = 0.05, theta: float = 0.9,
                                t_err: float = 1e-5, max_loops: int = 500,
                                segment_loops: int = 50,
                                return_stats: bool = False):
        """`sample_adaptive` with the `while_loop` split into bounded device
        dispatches: one jitted segment runs at most `segment_loops` solver
        iterations, then control returns to the host, which inspects the
        (scalar) time/loop state and re-dispatches until t_0 is reached or
        `max_loops` total iterations are spent. Bitwise-identical to the
        single-dispatch form (same loop body, same iteration sequence; the
        carry crosses segments untouched — pinned by
        tests/test_dpm_solver.py::test_adaptive_chunked_bitwise).

        This is the relay-safe way to run large step budgets: each dispatch
        is bounded (~segment_loops · order · per-eval cost), so a transport
        that kills long-running device calls (the dev tunnel's stdio relay,
        CLAUDE.md) never sees the 4+ minute worst case that crashed it at
        `max_loops=500` single-dispatch. Host round-trips cost two scalar
        fetches per segment (~60 ms on the relay) — negligible against a
        multi-second segment. NOT jit-compatible (host control flow); call
        it un-traced, or use `sample_adaptive` inside larger jits."""
        assert order in (2, 3), "adaptive solver supports order 2 or 3"
        assert segment_loops >= 1
        t_0 = 1.0 / self.ns.total_N if t_end is None else t_end
        t_T = self.ns.T if t_start is None else t_start
        tsch = _TracedScheduleVP(self.ns)
        make_cond, body = self._adaptive_loop_fns(
            order, t_0, tsch, h_init, atol, rtol, theta, t_err)

        @jax.jit
        def segment(carry, loop_bound):
            # loop_bound is traced -> ONE compile serves every continuation
            return jax.lax.while_loop(make_cond(loop_bound), body, carry)

        carry = (x, x, jnp.float32(t_T), jnp.float32(h_init),
                 jnp.int32(0), jnp.int32(0))
        while True:
            s_now = float(carry[2])
            n_now = int(carry[4])
            if abs(s_now - t_0) <= t_err or n_now >= max_loops:
                break
            carry = segment(
                carry, jnp.int32(min(n_now + segment_loops, max_loops)))
        x, _, _, _, n, n_acc = carry
        if return_stats:
            return x, {"steps_attempted": n, "steps_accepted": n_acc}
        return x

    def _sample_multistep(self, x, steps, order, skip_type, t_T, t_0, lower_order_final):
        assert steps >= order
        ts = self.get_time_steps(skip_type, t_T, t_0, steps)
        model_prev = [self._eval(x, float(ts[0]))]
        t_prev = [float(ts[0])]
        # Warm-up ramp at increasing orders.
        for step in range(1, order):
            t = float(ts[step])
            x = self._multistep_update(x, model_prev, t_prev, t, step)
            t_prev.append(t)
            model_prev.append(self._eval(x, t))

        use_lower_final = lower_order_final and steps < 10
        if use_lower_final or steps - order < 4:
            # Short runs: unrolling is cheaper than a scan body + stacking.
            for step in range(order, steps + 1):
                t = float(ts[step])
                step_order = min(order, steps + 1 - step) if use_lower_final else order
                x = self._multistep_update(
                    x, model_prev[-order:], t_prev[-order:], t, step_order
                )
                t_prev.append(t)
                if step < steps:
                    model_prev.append(self._eval(x, t))
            return x

        # Steady state: uniform order → lax.scan with a ring of `order`
        # cached model values. The final step (no trailing eval) runs outside.
        return self._multistep_scan(x, ts, order, model_prev, t_prev, steps)

    def _multistep_scan(self, x, ts, order, model_prev, t_prev, steps):
        lam = self.ns.marginal_lambda(ts)
        alpha = self.ns.marginal_alpha(ts)
        sigma = self.ns.marginal_std(ts)
        t_inputs = self.ns.model_input_time(ts)
        start, end = order, steps  # scan covers [start, end) with evals

        def coeffs(step):
            # step targets ts[step]; previous points are ts[step-1], ts[step-2], ...
            h = lam[step] - lam[step - 1]
            out = {
                "h": h,
                "sig_ratio": sigma[step] / sigma[step - 1],
                "alpha_ratio": alpha[step] / alpha[step - 1],
                "alpha_t": alpha[step],
                "sigma_t": sigma[step],
                "t_input": t_inputs[step],
                "r0": (lam[step - 1] - lam[step - 2]) / h,
            }
            if order == 3:
                out["r1"] = (lam[step - 2] - lam[step - 3]) / h
            return out

        table = {
            k: jnp.asarray(np.stack([coeffs(s)[k] for s in range(start, end)]), jnp.float32)
            for k in coeffs(start)
        }
        ring = jnp.stack(model_prev[-order:])  # (order, ...) oldest..newest

        def body(carry, c):
            x, ring = carry
            h = c["h"]
            if self.algorithm_type == "dpmsolver++":
                phi_1 = jnp.expm1(-h)
                base = c["sig_ratio"] * x - c["alpha_t"] * phi_1 * ring[-1]
                factor = c["alpha_t"]
                phi_2 = phi_1 / h + 1.0
            else:
                phi_1 = jnp.expm1(h)
                base = c["alpha_ratio"] * x - c["sigma_t"] * phi_1 * ring[-1]
                factor = c["sigma_t"]
                phi_2 = phi_1 / h - 1.0
            d1_0 = (ring[-1] - ring[-2]) / c["r0"]
            if order == 2:
                if self.solver_type == "dpmsolver":
                    correction = -0.5 * factor * phi_1 * d1_0
                elif self.algorithm_type == "dpmsolver++":
                    correction = factor * (phi_1 / h + 1.0) * d1_0
                else:
                    correction = -factor * (phi_1 / h - 1.0) * d1_0
                x_new = base + correction
            else:  # order 3 (`multistep_dpm_solver_third_update:876-928`)
                d1_1 = (ring[-2] - ring[-3]) / c["r1"]
                d1 = d1_0 + (c["r0"] / (c["r0"] + c["r1"])) * (d1_0 - d1_1)
                d2 = (d1_0 - d1_1) / (c["r0"] + c["r1"])
                phi_3 = phi_2 / h - 0.5
                if self.algorithm_type == "dpmsolver++":
                    x_new = base + factor * phi_2 * d1 - factor * phi_3 * d2
                else:
                    x_new = base - factor * phi_2 * d1 - factor * phi_3 * d2
            t_in = jnp.full((x.shape[0],), c["t_input"])
            new_model = self._eval_with(x_new, t_in, c["alpha_t"], c["sigma_t"])
            ring = jnp.concatenate([ring[1:], new_model[None]], axis=0)
            return (x_new, ring), None

        (x, ring), _ = jax.lax.scan(body, (x, ring), table)
        # Final update to ts[steps] without a trailing model eval.
        t_prev_tail = [float(t) for t in ts[steps - order : steps]]
        model_tail = [ring[i] for i in range(order)]
        return self._multistep_update(
            x, model_tail, t_prev_tail, float(ts[steps]), order
        )

    def _sample_singlestep(self, x, steps, order, skip_type, t_T, t_0, fixed=False):
        if fixed:
            k = steps // order
            orders = [order] * k
            ts_outer = self.get_time_steps(skip_type, t_T, t_0, k)
        else:
            orders = self._singlestep_orders(steps, order)
            k = len(orders)
            if skip_type == "logSNR":
                ts_outer = self.get_time_steps(skip_type, t_T, t_0, k)
            else:
                full = self.get_time_steps(skip_type, t_T, t_0, steps)
                ts_outer = full[np.cumsum([0] + orders)]

        # Scan the uniform order-3 prefix (the bulk of DPM-Solver-fast: 30
        # steps → 9-10 blocks): one compiled 3-eval body instead of ~30
        # unrolled UNet graph copies. Supported for the flagship config
        # (dpmsolver++ / dpmsolver solver_type); other combos unroll below.
        start = 0
        n3 = 0
        while n3 < len(orders) and orders[n3] == 3:
            n3 += 1
        if (
            n3 >= 2
            and self.algorithm_type == "dpmsolver++"
            and self.solver_type == "dpmsolver"
        ):
            x = self._singlestep3_scan(x, ts_outer[: n3 + 1], skip_type)
            start = n3

        for step in range(start, len(orders)):
            step_order = orders[step]
            s, t = float(ts_outer[step]), float(ts_outer[step + 1])
            inner = self.get_time_steps(skip_type, s, t, step_order)
            lam_inner = self.ns.marginal_lambda(inner)
            h = lam_inner[-1] - lam_inner[0]
            r1 = None if step_order <= 1 else float((lam_inner[1] - lam_inner[0]) / h)
            r2 = None if step_order <= 2 else float((lam_inner[2] - lam_inner[0]) / h)
            x = self._singlestep_update(x, s, t, step_order, r1=r1, r2=r2)
        return x

    def _singlestep3_scan(self, x, ts_blocks, skip_type):
        """lax.scan over consecutive singlestep order-3 blocks
        (dpmsolver++ / 'dpmsolver' solver type). All per-block coefficients
        are stacked static tables; the body runs the 3 model evaluations of
        `singlestep_dpm_solver_third_update` (`dpm_solver_pytorch.py:693-816`)."""
        ns = self.ns
        rows = []
        for i in range(len(ts_blocks) - 1):
            s, t = float(ts_blocks[i]), float(ts_blocks[i + 1])
            inner = self.get_time_steps(skip_type, s, t, 3)
            lam = ns.marginal_lambda(inner)
            h = lam[-1] - lam[0]
            r1 = float((lam[1] - lam[0]) / h)
            r2 = float((lam[2] - lam[0]) / h)
            s1 = float(ns.inverse_lambda(lam[0] + r1 * h))
            s2 = float(ns.inverse_lambda(lam[0] + r2 * h))
            rows.append(dict(
                sig_s=float(ns.marginal_std(s)),
                sig_s1=float(ns.marginal_std(s1)),
                sig_s2=float(ns.marginal_std(s2)),
                sig_t=float(ns.marginal_std(t)),
                al_s1=float(ns.marginal_alpha(s1)),
                al_s2=float(ns.marginal_alpha(s2)),
                al_t=float(ns.marginal_alpha(t)),
                al_s=float(ns.marginal_alpha(s)),
                phi_11=float(np.expm1(-r1 * h)),
                phi_12=float(np.expm1(-r2 * h)),
                phi_1=float(np.expm1(-h)),
                phi_22=float(np.expm1(-r2 * h) / (r2 * h) + 1.0),
                phi_2=float(np.expm1(-h) / h + 1.0),
                r2_over_r1=r2 / r1,
                inv_r2=1.0 / r2,
                tin_s=float(ns.model_input_time(s)),
                tin_s1=float(ns.model_input_time(s1)),
                tin_s2=float(ns.model_input_time(s2)),
            ))
        table = {
            key: jnp.asarray([row[key] for row in rows], jnp.float32)
            for key in rows[0]
        }
        batch = x.shape[0]

        def body(x, c):
            tfull = lambda v: jnp.full((batch,), v)
            m_s = self._eval_with(x, tfull(c["tin_s"]), c["al_s"], c["sig_s"])
            x_s1 = (c["sig_s1"] / c["sig_s"]) * x - c["al_s1"] * c["phi_11"] * m_s
            m_s1 = self._eval_with(x_s1, tfull(c["tin_s1"]), c["al_s1"], c["sig_s1"])
            x_s2 = (
                (c["sig_s2"] / c["sig_s"]) * x
                - c["al_s2"] * c["phi_12"] * m_s
                + c["r2_over_r1"] * c["al_s2"] * c["phi_22"] * (m_s1 - m_s)
            )
            m_s2 = self._eval_with(x_s2, tfull(c["tin_s2"]), c["al_s2"], c["sig_s2"])
            x_new = (
                (c["sig_t"] / c["sig_s"]) * x
                - c["al_t"] * c["phi_1"] * m_s
                + c["inv_r2"] * c["al_t"] * c["phi_2"] * (m_s2 - m_s)
            )
            return x_new, None

        x, _ = jax.lax.scan(body, x, table)
        return x
