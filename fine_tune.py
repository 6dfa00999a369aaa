"""Fine-tuning entry point (reference: fine_tune.py): identical to train.py
plus a weights-only warm start from cfg.dataset.pretrained_path
(fine_tune.py:14-20,75-77); run name suffixed '/fine-tune'."""

from __future__ import annotations

from dpde_tpu.utils.config import main as config_main
from train import build_and_train


@config_main(config_path="conf", config_name="train")
def main(cfg):
    pretrained = cfg.dataset.pretrained_path
    if pretrained is None:
        raise ValueError(
            "fine_tune.py requires dataset.pretrained_path to be set")
    return build_and_train(cfg, pretrained_path=pretrained,
                           run_suffix="fine-tune")


if __name__ == "__main__":
    main()
