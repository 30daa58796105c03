"""Training CLI (reference train.py): `python train.py <config.toml> [run_id]`."""

import sys

from medtsllm_tpu.config import load_config
from medtsllm_tpu.tasks import get_trainer
from medtsllm_tpu.utils import get_run_id


def main(config_path, run_id=None):
    config = load_config(config_path)

    run_id = run_id or get_run_id(config)
    trainer = get_trainer(run_id, config)

    trainer.train()
    test_scores = trainer.test()
    trainer.log_end()

    print("Test results:", test_scores)
    print("Run ID:", run_id)
    return test_scores


if __name__ == "__main__":
    match sys.argv:
        case [_, config_path, run_id]:
            main(config_path, run_id)
        case [_, config_path]:
            main(config_path)
        case _:
            main("configs/config.toml")
