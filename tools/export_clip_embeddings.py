"""Regenerate the frozen sensor-prompt CLIP embedding table.

Run in an environment with the HF clip-vit-large-patch14 checkpoint:

    python tools/export_clip_embeddings.py /path/to/clip-vit-large-patch14

Writes tmdiff_tpu/models/prompt_embeddings.npz with the real pooled CLIP
vectors (is_real_clip=True); until then the framework uses deterministic
placeholder vectors (see tmdiff_tpu/models/clip_text.py).
"""
import sys

sys.path.insert(0, ".")

import numpy as np

from tmdiff_tpu.models.clip_text import SENSORS, _TABLE_PATH, encode_prompts_live


def main():
    if len(sys.argv) != 2:
        raise SystemExit(__doc__)
    table = encode_prompts_live(sys.argv[1])
    np.savez(_TABLE_PATH, table=table, is_real_clip=np.array(True),
             sensors=np.array(SENSORS))
    print(f"wrote {_TABLE_PATH} with shape {table.shape} (real CLIP)")


if __name__ == "__main__":
    main()
