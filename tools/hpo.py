"""Hyperparameter search CLI.

The TPU-native counterpart of the reference's three HPO entry points
(utils/loggers/wandb/sweep.py, utils/loggers/clearml/hpo.py,
utils/loggers/comet/hpo.py): one driver, four backends.

    # local random search, 20 short trainings
    python tools/hpo.py --data coco128-seg.yaml --cfg yolov5n-seg.yaml \
        --epochs 3 --trials 20 --backend local

    # GA refinement seeded from the best-so-far (resumes hpo.csv)
    python tools/hpo.py ... --backend local --strategy evolve

    # provider-managed sweeps (need the package + credentials)
    python tools/hpo.py ... --backend wandb --trials 10
"""

import argparse
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))


def make_objective(opt):
    """One trial = one short training run; fitness = the detection fitness
    (0.1*mAP50 + 0.9*mAP, reference utils/metrics.py fitness)."""
    sys.path.insert(0, str(ROOT / "segment"))
    import importlib.util
    spec = importlib.util.spec_from_file_location("hpo_seg_train",
                                                  ROOT / "segment" / "train.py")
    seg_train = importlib.util.module_from_spec(spec)
    sys.modules["hpo_seg_train"] = spec.loader.exec_module(seg_train) or seg_train

    import tempfile

    import yaml

    def objective(hyp: dict) -> float:
        with tempfile.TemporaryDirectory() as td:
            hyp_file = Path(td) / "hyp.yaml"
            hyp_file.write_text(yaml.safe_dump({k: float(v) for k, v in hyp.items()}))
            topt = seg_train.parse_opt([
                "--cfg", opt.cfg, "--data", opt.data, "--hyp", str(hyp_file),
                "--epochs", str(opt.epochs), "--batch-size", str(opt.batch_size),
                "--imgsz", str(opt.imgsz), "--project", td, "--name", "trial",
                "--exist-ok"])
            try:
                return float(seg_train.train(topt))
            except Exception as e:  # a diverging trial is fitness 0, not a crash
                print(f"HPO trial failed: {e}", file=sys.stderr)
                return 0.0

    return objective


def main(opt):
    from yolo_dual_tpu.utils.hpo import (
        HyperparameterSearch,
        run_clearml_hpo,
        run_comet_hpo,
        run_wandb_sweep,
    )

    if opt.backend == "local":
        search = HyperparameterSearch(
            make_objective(opt), strategy=opt.strategy, trials=opt.trials,
            save_dir=opt.save_dir, seed=opt.seed)
        fitness, hyp = search.run()
        print(f"best fitness {fitness:.4g}")
        import yaml
        out = Path(opt.save_dir) / "hyp_best.yaml"
        out.write_text(yaml.safe_dump(hyp))
        print(f"best hyp saved to {out}")
    elif opt.backend == "wandb":
        run_wandb_sweep(lambda h: make_objective(opt)(h), count=opt.trials,
                        data=opt.data, epochs=opt.epochs, batch_size=opt.batch_size)
    elif opt.backend == "clearml":
        assert opt.base_task_id, "--base-task-id required for clearml"
        run_clearml_hpo(opt.base_task_id, max_trials=opt.trials)
    elif opt.backend == "comet":
        run_comet_hpo(lambda h: make_objective(opt)(h), max_trials=opt.trials)


def parse_opt(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="coco128-seg.yaml")
    p.add_argument("--cfg", default="yolov5n-seg.yaml")
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--trials", type=int, default=20)
    p.add_argument("--backend", default="local",
                   choices=["local", "wandb", "clearml", "comet"])
    p.add_argument("--strategy", default="random", choices=["random", "evolve"])
    p.add_argument("--save-dir", default="runs/hpo")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--base-task-id", default="", help="clearml template task")
    return p.parse_args(argv)


if __name__ == "__main__":
    main(parse_opt())
