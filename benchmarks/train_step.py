import sys; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from tmdiff_tpu.models import WavBEST
from tmdiff_tpu.models.clip_text import get_prompt_embedding
from tmdiff_tpu.diffusion.schedules import NoiseSchedule
from tmdiff_tpu.train.trainer import Trainer, TrainState

log = open("/dev/stdout", "a")
def P(*a): print(*a, file=log, flush=True)

B, bands, H, W = 8, 8, 64, 64   # reference training patch size
trainer = Trainer(
    model=WavBEST(channels=(32, 64, 128, 256), dtype=jnp.bfloat16),
    schedule=NoiseSchedule.create("cosine", 1000),
    lr=1e-4,
)
emb = jnp.asarray(get_prompt_embedding("WV3"))

@jax.jit
def init_state(seed):
    rng = jax.random.key(seed)
    x1 = jnp.zeros((1, bands, H, W))
    params = trainer.model.init(rng, x1, jnp.zeros((1,), jnp.int32),
                                jnp.zeros((1, 1, H, W)), x1, emb)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=trainer.tx.init(params),
                      ema_params=jax.tree.map(lambda x: x + 0, params))

@jax.jit
def step(state, seed):
    rng = jax.random.key(seed)
    batch = {
        "Res": jax.random.normal(jax.random.fold_in(rng, 0), (B, bands, H, W)) * 0.1,
        "PAN": jax.random.normal(jax.random.fold_in(rng, 1), (B, 1, H, W)),
        "MS": jax.random.normal(jax.random.fold_in(rng, 2), (B, bands, H, W)),
    }
    return trainer._step(state, batch, emb)

t0 = time.perf_counter()
state = init_state(0)
state, m = step(state, 1)
loss0 = float(m["l_pix"])
P(f"compile+first {time.perf_counter()-t0:.0f}s loss {loss0:.4f}")
N = 20
t0 = time.perf_counter()
for i in range(N):
    state, m = step(state, 2 + i)
loss = float(m["l_pix"])   # ground-truth sync
d = time.perf_counter() - t0
P(f"{N} train steps (batch {B}, {H}x{W}x{bands}): {d:.2f}s -> {N/d:.2f} steps/s, {N*B/d:.1f} img/s/chip (loss {loss:.4f})")
P("done")
