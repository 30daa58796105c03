"""Serving-export CLI: rehydrate a trained run and write its deployable
serving artifact (AOT-compiled StableHLO via jax.export — see
medtsllm_tpu/runtime/export.py). Complements train.py / test.py
(reference train.py:8-30, test.py:8-37 — which have no deployment story).

`python export.py <run_id> [out_dir] [ckpt_name] [basepath]`

Writes eval_step.jaxexport (+ prefill.jaxexport when the model serves
the prompt-prefix KV cache) + manifest.json, then round-trips one batch
through the deserialized artifact and reports the difference (0 — it is
the same XLA program).
"""

import sys
import tomllib
from pathlib import Path

from medtsllm_tpu.runtime.export import export_serving, verify_roundtrip
from medtsllm_tpu.tasks import task_lookup


def main(run_id, out_dir=None, save_id=None, _basepath=None):
    basepath = (Path(_basepath) if _basepath is not None
                else Path.cwd() / "outputs" / "logs")
    config = tomllib.loads((basepath / run_id / "config.toml").read_text())
    trainer = task_lookup[config["task"]].from_run_id(
        run_id, ckpt=save_id, basepath=_basepath)

    out = Path(out_dir) if out_dir else basepath / run_id / "export"
    batch = next(iter(trainer.val_pipeline))
    manifest = export_serving(trainer, out, batch=batch)
    diff = verify_roundtrip(trainer, out, batch=batch)
    print(f"Exported {sorted(p.name for p in out.iterdir())} -> {out}")
    print(f"Platforms: {manifest['platforms']}; "
          f"prefix_cached: {manifest['prefix_cached']}")
    print(f"Round-trip max |diff| on one batch: {diff}")
    assert diff == 0.0, "exported program must be bit-identical"
    return manifest


if __name__ == "__main__":
    match sys.argv:
        case [_, run_id]:
            main(run_id)
        case [_, run_id, out_dir]:
            main(run_id, out_dir)
        case [_, run_id, out_dir, save_id]:
            main(run_id, out_dir, save_id)
        case [_, run_id, out_dir, save_id, basepath]:
            main(run_id, out_dir, save_id, basepath)
        case _:
            raise ValueError("Invalid number of arguments")
