"""CLI front-end (storage_tpu/cli.py): the spreadsheet-less analog of the
reference's Excel worksheet-function surface (CmdtyStorageXl / IntrinsicXl /
MultiFactorXl / TrinomialXl / AddInInfoXl)."""
import json
import os

import numpy as np
import pandas as pd
import pytest

from storage_tpu.cli import main


@pytest.fixture()
def specs(tmp_path):
    facility = {
        "freq": "D", "start": "2021-04-01", "end": "2021-06-01",
        "injection_cost": 0.01, "withdrawal_cost": 0.025,
        "ratchets": [["2021-04-01", [[0, -150, 250], [2000, -200, 175]]]],
        "ratchet_interp": "linear",
    }
    idx = pd.period_range("2021-04-01", "2021-06-01", freq="D")
    market = {
        "val_date": "2021-04-01", "inventory": 0.0, "interest_rate": 0.03,
        "fwd": {str(p): round(20.0 + 4.0 * np.sin(i / 365 * 2 * np.pi), 4)
                for i, p in enumerate(idx)},
        "settlement_lag_days": 20,
    }
    model = {
        "spot_mean_reversion": 16.2, "spot_vol": 1.15, "long_term_vol": 0.14,
        "seasonal_vol": 0.18, "num_sims": 128, "seed": 11,
    }
    tree = {"spot_vol": 0.7, "mean_reversion": 14.5, "time_delta": 0.00274}
    paths = {}
    for name, spec in (("facility", facility), ("market", market),
                       ("model", model), ("tree", tree)):
        p = tmp_path / f"{name}.json"
        p.write_text(json.dumps(spec))
        paths[name] = str(p)
    paths["out"] = str(tmp_path / "out")
    return paths


def test_version(capsys):
    assert main(["version"]) == 0
    out = capsys.readouterr().out
    assert "storage_tpu" in out


def test_create_storage_and_probe(specs, capsys):
    assert main(["create-storage", specs["facility"],
                 "--probe", "2021-05-01:500"]) == 0
    out = capsys.readouterr().out
    assert "must_be_empty_at_end=True" in out
    # Linear ratchet at inventory 500: lerp between the 0 and 2000 nodes.
    assert "inject_rate=231.25" in out
    assert "withdraw_rate=-162.5" in out


def test_intrinsic(specs, capsys):
    assert main(["intrinsic", specs["facility"], specs["market"],
                 "--out", specs["out"]]) == 0
    out = capsys.readouterr().out
    assert out.startswith("intrinsic_npv ")
    assert float(out.split()[1]) > 0
    assert os.path.exists(os.path.join(specs["out"], "intrinsic_profile.csv"))


def test_three_factor_writes_results(specs, capsys):
    assert main(["three-factor", specs["facility"], specs["market"],
                 specs["model"], "--quiet", "--out", specs["out"],
                 "--grid-points", "40"]) == 0
    out = capsys.readouterr().out
    values = {line.split()[0]: float(line.split()[1].replace(",", ""))
              for line in out.strip().splitlines()}
    assert values["npv"] >= values["intrinsic_npv"] > 0
    # Printed at 2 dp, so the decomposition identity holds to a cent each way.
    assert values["npv"] == pytest.approx(
        values["intrinsic_npv"] + values["extrinsic_npv"], abs=0.021
    )
    for name in ("deltas.csv", "expected_profile.csv", "trigger_prices.csv"):
        assert os.path.exists(os.path.join(specs["out"], name))


def test_trinomial(specs, capsys):
    assert main(["trinomial", specs["facility"], specs["market"],
                 specs["tree"], "--grid-points", "40"]) == 0
    out = capsys.readouterr().out
    assert out.startswith("trinomial_npv ")
