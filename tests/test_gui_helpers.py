"""Headless tests for the GUI sample's pure helpers (samples/python/
storage_gui.py): curve parsing, ratchet-block parsing, state save/load, and
the facility builder — everything short of the widgets themselves."""
import importlib.util
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

_GUI_PATH = Path(__file__).parent.parent / "samples" / "python" / "storage_gui.py"
_spec = importlib.util.spec_from_file_location("storage_gui_sample", _GUI_PATH)
gui = importlib.util.module_from_spec(_spec)
sys.modules["storage_gui_sample"] = gui
_spec.loader.exec_module(gui)


class TestCurveParsing:
    def test_flat_interp_ffills_between_points(self):
        curve = gui.parse_point_curve(
            "2021-01-01 10.0\n2021-01-05 20.0\n", "2021-01-01", "2021-01-07"
        )
        assert list(curve.loc["2021-01-01":"2021-01-04"]) == [10.0] * 4
        assert list(curve.loc["2021-01-05":"2021-01-07"]) == [20.0] * 3

    def test_linear_interp(self):
        curve = gui.parse_point_curve(
            "2021-01-01 10.0\n2021-01-05 20.0\n", "2021-01-01", "2021-01-05",
            interp="linear",
        )
        np.testing.assert_allclose(curve.to_numpy(), [10.0, 12.5, 15.0, 17.5, 20.0])

    def test_comments_and_blank_lines_skipped(self):
        curve = gui.parse_point_curve(
            "# header\n\n2021-01-01 10.0\n", "2021-01-01", "2021-01-02"
        )
        assert list(curve) == [10.0, 10.0]

    def test_empty_raises(self):
        with pytest.raises(ValueError, match="empty"):
            gui.parse_point_curve("", "2021-01-01", "2021-01-02")


class TestRatchetParsing:
    def test_undated_table_uses_default_date(self):
        blocks = gui.parse_ratchet_blocks("0 -10 20\n100 -5 10\n", "2021-01-01")
        assert blocks == [("2021-01-01", [(0.0, -10.0, 20.0), (100.0, -5.0, 10.0)])]

    def test_multiple_dated_blocks(self):
        text = "@ 2021-01-01\n0 -10 20\n@ 2021-06-01\n0 -8 15\n50 -8 15\n"
        blocks = gui.parse_ratchet_blocks(text, "2021-01-01")
        assert [b[0] for b in blocks] == ["2021-01-01", "2021-06-01"]
        assert blocks[1][1] == [(0.0, -8.0, 15.0), (50.0, -8.0, 15.0)]

    def test_round_trip(self):
        text = gui.ratchet_blocks_to_text(
            [("2021-01-01", [(0.0, -10.0, 20.0)])]
        )
        assert gui.parse_ratchet_blocks(text, "x") == [
            ("2021-01-01", [(0.0, -10.0, 20.0)])
        ]

    def test_empty_raises(self):
        with pytest.raises(ValueError, match="empty"):
            gui.parse_ratchet_blocks("# nothing\n", "2021-01-01")


class TestStateAndStorage:
    def test_save_load_round_trip(self, tmp_path):
        state = dict(gui.DEFAULT_STATE, num_sims=123, ratchet_interp="step")
        path = str(tmp_path / "state.json")
        gui.save_state(state, path)
        loaded = gui.load_state(path)
        assert loaded["num_sims"] == 123
        assert loaded["ratchet_interp"] == "step"

    def test_load_ignores_unknown_keys(self, tmp_path):
        path = str(tmp_path / "state.json")
        import json

        with open(path, "w") as f:
            json.dump({"num_sims": 7, "bogus_key": 1}, f)
        loaded = gui.load_state(path)
        assert loaded["num_sims"] == 7
        assert "bogus_key" not in loaded

    def test_build_storage_ratcheted_and_simple(self):
        ratcheted = gui.build_storage(dict(gui.DEFAULT_STATE))
        assert ratcheted.start == pd.Period("2021-04-01", freq="D")
        simple = gui.build_storage(dict(gui.DEFAULT_STATE, use_ratchets=False))
        lo, hi = simple.inject_withdraw_range("2021-06-01", 100.0)
        assert (lo, hi) == (-261.0, 255.0)

    def test_build_storage_terminal_value(self):
        state = dict(gui.DEFAULT_STATE, use_terminal=True, terminal_spread=1.5)
        storage = gui.build_storage(state)
        assert storage.terminal_storage_npv(10.0, 3.0) == pytest.approx(25.5)

    def test_headless_valuation_tiny(self):
        """End-to-end valuation from a GUI state dict (tiny config)."""
        state = dict(
            gui.DEFAULT_STATE, end="2021-05-01", num_sims=128, grid_points=20,
        )
        fractions = []
        res = gui.run_valuation(state, on_progress=fractions.append)
        assert np.isfinite(res.npv)
        assert fractions[-1] == 1.0
