"""Remote-logger adapter tests: wiring verified against fake SDK modules
injected into sys.modules (the SaaS SDKs are not in this image; the adapters
must degrade to no-ops without them and route calls correctly with them)."""

import sys
import types

import numpy as np


def _fresh(monkeypatch, name):
    monkeypatch.delitem(sys.modules, name, raising=False)


def test_adapters_inert_without_sdks(monkeypatch, tmp_path):
    for name in ("wandb", "clearml", "comet_ml"):
        _fresh(monkeypatch, name)
    from yolo_dual_tpu.utils.remote_loggers import build_remote_loggers
    adapters = build_remote_loggers(["wandb", "clearml", "comet"], save_dir=tmp_path)
    assert len(adapters) == 3
    for a in adapters:
        assert not a.active
        a.log_metrics({"x": 1.0}, 0)      # must not raise
        a.log_image("t", np.zeros((4, 4, 3), np.uint8), 0)
        a.log_model(tmp_path, 0, True)
        a.finish()


def test_wandb_adapter_routes_calls(monkeypatch, tmp_path):
    calls = {"log": [], "artifacts": [], "finished": []}

    class FakeArtifact:
        def __init__(self, name, type=None, metadata=None):
            self.name, self.type = name, type
            self.files = []
        def add_file(self, p):
            self.files.append(p)
        def add_dir(self, p):
            self.files.append(p)

    class FakeRun:
        id = "abc"
        def log(self, metrics, step=None):
            calls["log"].append((metrics, step))
        def log_artifact(self, art, aliases=None):
            calls["artifacts"].append((art, aliases))
        def finish(self):
            calls["finished"].append(True)

    fake = types.ModuleType("wandb")
    fake.init = lambda **kw: FakeRun()
    fake.Artifact = FakeArtifact
    fake.Image = lambda im: ("img", np.shape(im))
    monkeypatch.setitem(sys.modules, "wandb", fake)

    from yolo_dual_tpu.utils.remote_loggers import WandbLogger
    wl = WandbLogger(save_dir=tmp_path)
    assert wl.active
    wl.log_metrics({"loss": 1.0}, 3)
    wl.log_image("mosaic", np.zeros((2, 2, 3), np.uint8), 3)
    f = tmp_path / "w.bin"
    f.write_bytes(b"x")
    wl.log_model(f, epoch=2, best=True)
    wl.log_artifact(f, type="dataset")
    wl.finish()
    assert calls["log"][0] == ({"loss": 1.0}, 3)
    assert calls["artifacts"][0][1] == ["latest", "best"]
    assert calls["artifacts"][1][0].type == "dataset"
    assert calls["finished"]


def test_clearml_adapter_routes_calls(monkeypatch, tmp_path):
    scalars = []

    class FakeLogger:
        def report_scalar(self, title, series, value, iteration):
            scalars.append((title, series, value, iteration))
        def report_image(self, *a, **k):
            pass

    class FakeTask:
        def get_logger(self):
            return FakeLogger()
        def connect(self, cfg):
            pass
        def upload_artifact(self, *a, **k):
            pass
        def update_output_model(self, **k):
            pass
        def close(self):
            pass

    fake = types.ModuleType("clearml")
    fake.Task = types.SimpleNamespace(init=lambda **kw: FakeTask())
    monkeypatch.setitem(sys.modules, "clearml", fake)

    from yolo_dual_tpu.utils.remote_loggers import ClearMLLogger
    cl = ClearMLLogger()
    assert cl.active
    cl.log_metrics({"train/box_loss": 0.5}, 7)
    assert scalars == [("train", "box_loss", 0.5, 7)]
    cl.finish()


def test_loggers_facade_with_fake_wandb(monkeypatch, tmp_path):
    logged = []
    fake = types.ModuleType("wandb")

    class FakeRun:
        id = "r"
        def log(self, m, step=None):
            logged.append((m, step))
        def finish(self):
            pass
    fake.init = lambda **kw: FakeRun()
    fake.Artifact = lambda *a, **k: types.SimpleNamespace(add_file=lambda p: None,
                                                          add_dir=lambda p: None)
    fake.Image = lambda im: im
    monkeypatch.setitem(sys.modules, "wandb", fake)

    from yolo_dual_tpu.utils.loggers import Loggers, SEG_KEYS
    lg = Loggers(tmp_path, include=("csv", "tb", "wandb"))
    assert lg.wandb is not None
    lg.on_fit_epoch_end(list(range(len(SEG_KEYS))), epoch=0)
    assert logged and logged[0][1] == 0
    assert (tmp_path / "results.csv").exists()
    lg.close()
