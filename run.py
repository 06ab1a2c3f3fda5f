"""Training entry point: ``python run.py --opt json/kitti/...json``.

The reference repo's driver (``run.py``) is absent from its snapshot (its
wandb metadata records the name; SURVEY.md §0) — this is the reconstructed,
TPU-native equivalent. See mde_tpu/train/driver.py.
"""

from mde_tpu.train.driver import main

if __name__ == "__main__":
    main()
