"""CLI surface tests: grid expansion + save-path abbreviation semantics
(ref main.py:35-103)."""
import sys

sys.path.insert(0, ".")  # repo root for main.py

from vlsa_tpu.config import convert_to_abbr, ignore_in_save_path


def test_abbreviations():
    assert convert_to_abbr("data_split_seed") == "fold"
    assert convert_to_abbr("vlsa_img_encoder_query_text_method") == "tex"
    assert convert_to_abbr("unknown_key") == "unknown_key"
    assert ignore_in_save_path("num_shot", -1) is True
    assert ignore_in_save_path("num_shot", 4) is False
    assert ignore_in_save_path("dataset_name", "tcga_blca") is True
    assert ignore_in_save_path("epochs", 3) is False


def test_multi_run_save_paths(monkeypatch):
    import main as cli

    captured = []

    class FakeHandler:
        def __init__(self, cfg):
            captured.append(dict(cfg))

        def exec(self):
            return {}

        def exec_test(self):
            return {}

    config = {
        "save_path": "./res/{0}-RUN",
        "dataset_name": ["tcga_blca"],
        "data_split_seed": [0, 1],
        "num_shot": [-1],
        "test": False,
        "epochs": 1,
    }
    cli.multi_run_main(FakeHandler, config, sleep=0)
    assert len(captured) == 2
    paths = sorted(c["save_path"] for c in captured)
    # dataset_name and num_shot=-1 are ignored; fold suffix appended
    assert paths == ["./res/{0}-RUN-fold_0", "./res/{0}-RUN-fold_1"]


def test_config_validation():
    from vlsa_tpu.config_schema import validate_config
    import pytest as _pytest

    problems = validate_config({"task": "sa"}, "sa")
    assert any("missing required key" in p for p in problems)
    with _pytest.raises(ValueError):
        validate_config({"task": "sa"}, "sa", strict=True)
    # a complete config has no problems
    from test_runner_e2e import base_cfg, make_cohort
    import tempfile, pathlib
    with tempfile.TemporaryDirectory() as d:
        t, s = make_cohort(pathlib.Path(d))
        cfg = base_cfg(pathlib.Path(d), t, s)
        assert validate_config(cfg, "sa") == []
