"""Evaluation CLI (reference test.py): rehydrate a run from its run-id and
evaluate a checkpoint on the test or val split.

`python test.py <run_id> [split] [ckpt_name] [basepath]`
"""

import sys
import tomllib
from pathlib import Path

from medtsllm_tpu.tasks import task_lookup


def main(run_id, split="test", save_id=None, _basepath=None):
    basepath = Path(_basepath) if _basepath is not None else Path.cwd() / "outputs" / "logs"
    config = tomllib.loads((basepath / run_id / "config.toml").read_text())
    task = config["task"]

    task_cls = task_lookup[task]
    trainer = task_cls.from_run_id(run_id, ckpt=save_id, basepath=_basepath)

    if split == "test":
        scores = trainer.test()
    elif split == "val":
        scores = trainer.val()
    else:
        raise ValueError(f"Invalid split selected for testing: {split}")

    print("Results:", scores)
    print("Run ID:", run_id)
    return scores


if __name__ == "__main__":
    match sys.argv:
        case [_, run_id]:
            main(run_id)
        case [_, run_id, split]:
            main(run_id, split)
        case [_, run_id, split, save_id]:
            main(run_id, split, save_id)
        case [_, run_id, split, save_id, basepath]:
            main(run_id, split, save_id, basepath)
        case _:
            raise ValueError("Invalid number of arguments")
