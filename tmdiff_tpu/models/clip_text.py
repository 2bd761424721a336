"""Frozen sensor-prompt text embeddings.

The reference conditions the UNet on pooled CLIP text embeddings of five
fixed per-sensor prompt paragraphs, computed once at model init and cached
(`/root/reference/GeneralModel/Hyper_unet_general.py:566-598`,
`core/clip.py:15-59`: HF clip-vit-large-patch14, `pooler_output`, (1, 768)).

Because the prompts are frozen constants, the TPU-native design bakes them in
as a (num_sensors, 768) table — zero host↔device traffic and no transformers
dependency in the hot path. The table ships in `prompt_embeddings.npz`:

  * If the file was produced by `tools/export_clip_embeddings.py` (requires
    the HF CLIP checkpoint), it contains the real pooled CLIP vectors.
  * Otherwise a deterministic placeholder table (seeded Gaussian, unit-norm
    matching CLIP's pooled-embedding scale) is generated on first use. The
    placeholder preserves the framework contract — a distinct frozen
    conditioning vector per sensor — and is swapped for the real CLIP table
    without retraining-incompatible shape changes.

An optional live encoder (`encode_prompts_live`) runs HF transformers on the
host when a checkpoint path is available.

Export attempts (recorded per the parity protocol):

  * 2026-08-17 (r3): no HF cache on this host (`~/.cache/huggingface`
    absent, no `*clip*` checkpoint anywhere on disk) and zero network
    egress. `CLIPTextModel.from_pretrained('openai/clip-vit-large-patch14')`
    fails with::

        OSError: We couldn't connect to 'https://huggingface.co' to load
        the files, and couldn't find them in the cached files.

    The real (5, 768) table therefore CANNOT be produced in this
    environment. The placeholder remains; every fidelity-claiming path is
    gated by `require_real_clip` (checkpoint import, eval-harness parity
    mode), and README/PARITY carry no SAM/ERGAS-parity numbers. To close
    the gap on a networked machine:
    `python tools/export_clip_embeddings.py openai/clip-vit-large-patch14`.
  * 2026-08-20 (r5): re-attempted — still no HF cache on disk and DNS
    resolution for huggingface.co fails (zero egress). Same conclusion.
  * 2026-08-18 (r4): re-attempted — same OSError (no network, no cache).
    Placeholder-mode is now additionally stamped into every eval artifact
    (`clip_mode` key in .mat files and tool JSONs — `clip_mode()` below)
    so downstream users cannot mistake placeholder-conditioned outputs for
    real-CLIP ones.
"""
from __future__ import annotations

import functools
import hashlib
import os

import numpy as np

# Sensor prompt paragraphs — behavioral-contract data replicated from
# `Hyper_unet_general.py:574-585` (they determine the CLIP embeddings that
# reference checkpoints were trained with; note the reference's WV2 entry
# reuses the GaoFen-2 wording with WV2 numbers — preserved as-is).
SENSOR_PROMPTS: dict[str, str] = {
    "QB": (
        "The QuickBird satellite captures high-resolution images with notable "
        "physical properties. Its panchromatic sensor acquires images at a "
        "0.61-meter resolution, providing crisp and detailed grayscale visuals. "
        "The multispectral sensor captures images at a 2.44-meter resolution in "
        "four spectral bands: blue (450-520 nm), green (520-600 nm), red "
        "(630-690 nm), and near-infrared (760-900 nm). These physical properties "
        "enable accurate Earth observation, supporting applications in "
        "environmental monitoring, land use planning, urban mapping, and "
        "disaster management."
    ),
    "WV3": (
        "The WorldView-3 satellite captures high-resolution images with "
        "exceptional physical properties. Its panchromatic sensor acquires "
        "images at a 31 cm resolution, delivering sharp and detailed grayscale "
        "visuals. The multispectral sensor captures images at a 1.24 m "
        "resolution in eight spectral bands: coastal (400-450 nm), blue "
        "(450-510 nm), green (510-580 nm), yellow (585-625 nm), red "
        "(630-690 nm), red edge (705-745 nm), near-infrared 1 (770-895 nm), and "
        "near-infrared 2 (860-1,040 nm). Additionally, WorldView-3 features a "
        "shortwave infrared (SWIR) sensor with 3.7 m resolution in eight bands "
        "(1,195-1,385 nm, 1,560-1,660 nm, 2,045-2,110 nm, etc.). These physical "
        "properties enable advanced Earth observation, supporting applications "
        "in environmental monitoring, land use planning, urban mapping, and "
        "disaster response."
    ),
    "GF2": (
        "The GaoFen-2 satellite captures high-resolution images with notable "
        "physical properties. Its panchromatic sensor acquires images at a "
        "1.0-meter resolution, delivering clear and detailed grayscale visuals. "
        "The multispectral sensor captures images at a 4.0-meter resolution in "
        "four spectral bands: blue (450-520 nm), green (520-590 nm), red "
        "(630-690 nm), and near-infrared (770-890 nm). These physical "
        "properties enable accurate Earth observation, supporting applications "
        "in urban planning, environmental monitoring, disaster management, and "
        "land use analysis."
    ),
    "WV2": (
        "The GaoFen-2 satellite captures high-resolution images with notable "
        "physical properties. Its panchromatic sensor acquires images at a "
        "0.5-meter resolution, delivering clear and detailed grayscale visuals. "
        "The multispectral sensor captures images at a 2.0-meter resolution in "
        "four spectral bands: blue (450-520 nm), green (520-590 nm), red "
        "(630-690 nm), and near-infrared (770-890 nm). These physical "
        "properties enable accurate Earth observation, supporting applications "
        "in urban planning, environmental monitoring, disaster management, and "
        "land use analysis."
    ),
    "WV4": (
        "The WorldView-4 satellite captures high-resolution images with "
        "remarkable physical properties. Its panchromatic sensor acquires "
        "images at a 31 cm resolution, providing sharp, detailed grayscale "
        "visuals. The multispectral sensor captures images at a 1.24 m "
        "resolution in four spectral bands: blue (450-510 nm), green "
        "(510-580 nm), red (630-690 nm), and near-infrared (770-895 nm). These "
        "physical properties enable precise Earth observation, facilitating "
        "applications in environmental monitoring, land use planning, and "
        "disaster response."
    ),
}

SENSORS: tuple[str, ...] = ("QB", "WV3", "GF2", "WV2", "WV4")
EMBED_DIM = 768

_TABLE_PATH = os.path.join(os.path.dirname(__file__), "prompt_embeddings.npz")


def placeholder_text_embedding(text: str) -> np.ndarray:
    """Deterministic pseudo-CLIP vector derived from arbitrary prompt text.

    Scaled to ~unit RMS per component like CLIP pooled outputs; stable across
    processes (seed = sha256 of the prompt). Used for the sensor prompts
    above and for the ControlNet task prompts (models/controlnet.py); the
    same placeholder-mode caveats apply (clip_mode(), require_real_clip)."""
    seed = int.from_bytes(hashlib.sha256(text.encode()).digest()[:8], "little")
    vec = np.random.default_rng(seed).standard_normal(EMBED_DIM)
    return (vec / np.linalg.norm(vec) * np.sqrt(EMBED_DIM)).astype(np.float32)


def _placeholder_embedding(sensor: str) -> np.ndarray:
    return placeholder_text_embedding(SENSOR_PROMPTS[sensor])


@functools.lru_cache(maxsize=1)
def load_prompt_table() -> tuple[np.ndarray, dict[str, int], bool]:
    """Returns (table (S, 768), sensor→row index, is_real_clip).

    Cached: clip_mode() is stamped into every saved .mat artifact, so a
    validation pass would otherwise re-read the npz (or regenerate the
    placeholder table) once per image. Callers must not mutate the returned
    arrays; after tools/export_clip_embeddings.py rewrites the npz, a new
    process (or `load_prompt_table.cache_clear()`) picks it up."""
    index = {s: i for i, s in enumerate(SENSORS)}
    if os.path.exists(_TABLE_PATH):
        data = np.load(_TABLE_PATH)
        table = data["table"].astype(np.float32)
        is_real = bool(data.get("is_real_clip", np.array(False)))
        return table, index, is_real
    table = np.stack([_placeholder_embedding(s) for s in SENSORS])
    return table, index, False


def get_prompt_embedding(sensor: str) -> np.ndarray:
    table, index, _ = load_prompt_table()
    if sensor not in index:
        raise ValueError(f"unknown sensor {sensor!r}; known: {list(index)}")
    return table[index[sensor]]


def is_real_clip() -> bool:
    return load_prompt_table()[2]


def clip_mode() -> str:
    """Marker stamped into every eval artifact (.mat headers, tool JSONs):
    'real-clip' when the shipped table came from the true
    clip-vit-large-patch14 export, else 'placeholder-clip' — outputs
    conditioned on the placeholder must never masquerade as
    reference-fidelity results (see module docstring, r4 export attempt)."""
    return "real-clip" if is_real_clip() else "placeholder-clip"


def require_real_clip(context: str) -> None:
    """Guard for reference-parity claims: anything whose correctness depends
    on the TRUE CLIP conditioning vectors (importing a trained reference
    checkpoint for metric comparison, claiming SAM/ERGAS-within-1% parity)
    must call this and fail loudly while the shipped table is the
    placeholder. Override with TMDIFF_ALLOW_FAKE_CLIP=1 for structural
    (shape/transplant-mechanics) work that doesn't claim fidelity."""
    if is_real_clip() or os.environ.get("TMDIFF_ALLOW_FAKE_CLIP"):
        return
    raise RuntimeError(
        f"{context} requires the real CLIP prompt-embedding table, but "
        f"{_TABLE_PATH} is absent/placeholder (is_real_clip=False). "
        "Regenerate with tools/export_clip_embeddings.py against "
        "openai/clip-vit-large-patch14 (needs network or a local checkpoint), "
        "or set TMDIFF_ALLOW_FAKE_CLIP=1 to proceed WITHOUT fidelity claims."
    )


def encode_prompts_live(model_path: str, layer: str = "pooled") -> np.ndarray:
    """Host-side HF transformers CLIP text encoding (reference
    `core/clip.py:15-59` semantics: max_length 77, pooled output)."""
    import torch
    from transformers import CLIPTokenizer, CLIPTextModel

    tokenizer = CLIPTokenizer.from_pretrained(model_path)
    model = CLIPTextModel.from_pretrained(model_path).eval()
    rows = []
    with torch.no_grad():
        for sensor in SENSORS:
            batch = tokenizer(
                SENSOR_PROMPTS[sensor],
                truncation=True,
                max_length=77,
                return_length=True,
                return_overflowing_tokens=False,
                padding="max_length",
                return_tensors="pt",
            )
            outputs = model(input_ids=batch["input_ids"])
            if layer == "pooled":
                rows.append(outputs.pooler_output[0].numpy())
            else:
                rows.append(outputs.last_hidden_state[0].numpy())
    return np.stack(rows).astype(np.float32)
