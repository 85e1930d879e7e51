"""Interactive storage-valuation GUI (ipywidgets).

The analog of the reference's ``samples/python/storage_gui.py`` /
``multi_factor_gui.ipynb`` widget front-end: facility + market + model inputs
as notebook widgets, a Value button running the 3-factor-seasonal LSMC, and
NPV/deltas/expected-profile output. Re-designed for this framework — no
spreadsheet grids or Qt file dialogs; curves are entered as simple
``date value`` text lines and flat-interpolated.

Usage in a notebook (requires ipywidgets + matplotlib, which are not part of
the framework's dependencies)::

    from storage_gui import build_gui
    build_gui()
"""
from __future__ import annotations

import io

import numpy as np
import pandas as pd

from storage_tpu import CmdtyStorage, RatchetInterp, three_factor_seasonal_value

try:  # pragma: no cover - optional GUI dependencies
    import ipywidgets as ipw
    from IPython.display import display
except ImportError:  # pragma: no cover
    ipw = None


DEFAULT_FWD = """2021-04-01 26.0
2021-07-01 24.5
2021-10-01 28.5
2022-01-01 34.0
2022-04-01 27.0
"""

DEFAULT_RATCHETS = """0 -150 255
2000 -200 175
5000 -261 156
"""


def parse_point_curve(text: str, start, end, freq: str = "D") -> pd.Series:
    """``date value`` lines -> a per-period curve, piecewise-flat between the
    listed dates (a deliberately simple stand-in for a smooth curve builder)."""
    rows = []
    for line in io.StringIO(text):
        line = line.strip()
        if not line:
            continue
        date_s, value_s = line.split()
        rows.append((pd.Period(date_s, freq=freq), float(value_s)))
    if not rows:
        raise ValueError("Curve text is empty.")
    rows.sort()
    idx = pd.period_range(start, end, freq=freq)
    points = pd.Series({p: v for p, v in rows})
    return points.reindex(idx).ffill().bfill()


def parse_ratchets(text: str):
    nodes = []
    for line in io.StringIO(text):
        line = line.strip()
        if not line:
            continue
        inv, wdr, inj = (float(x) for x in line.split())
        nodes.append((inv, wdr, inj))
    if not nodes:
        raise ValueError("Ratchet table is empty.")
    return nodes


def run_valuation(
    start: str, end: str, val_date: str, inventory: float,
    injection_cost: float, withdrawal_cost: float, ratchet_text: str,
    fwd_text: str, rate: float, spot_vol: float, spot_mr: float,
    long_term_vol: float, seasonal_vol: float, num_sims: int, seed: int,
):
    """Build the facility + market from the GUI inputs and value it."""
    storage = CmdtyStorage(
        freq="D", storage_start=start, storage_end=end,
        injection_cost=injection_cost, withdrawal_cost=withdrawal_cost,
        ratchets=[(start, parse_ratchets(ratchet_text))],
        ratchet_interp=RatchetInterp.LINEAR,
    )
    fwd = parse_point_curve(fwd_text, start, end)
    return three_factor_seasonal_value(
        storage, val_date, inventory, fwd, float(rate), None,
        spot_mean_reversion=spot_mr, spot_vol=spot_vol,
        long_term_vol=long_term_vol, seasonal_vol=seasonal_vol,
        num_sims=int(num_sims),
        basis_funcs="1 + x_st + x_sw + x_lt + x_st**2 + x_sw**2 + x_lt**2 + s + s**2",
        discount_deltas=False, seed=int(seed),
    )


def build_gui():  # pragma: no cover - interactive
    """Assemble and display the widget GUI. Returns the root widget."""
    if ipw is None:
        raise ImportError(
            "storage_gui needs ipywidgets (and a notebook front-end): "
            "pip install ipywidgets matplotlib"
        )

    start = ipw.Text(value="2021-04-01", description="Start")
    end = ipw.Text(value="2022-04-01", description="End")
    val_date = ipw.Text(value="2021-04-01", description="Val date")
    inventory = ipw.FloatText(value=1500.0, description="Inventory")
    inj_cost = ipw.FloatText(value=0.01, description="Inj cost")
    wdr_cost = ipw.FloatText(value=0.025, description="Wdr cost")
    ratchets = ipw.Textarea(value=DEFAULT_RATCHETS, description="Ratchets",
                            layout=ipw.Layout(height="90px"))
    fwd = ipw.Textarea(value=DEFAULT_FWD, description="Fwd curve",
                       layout=ipw.Layout(height="120px"))
    rate = ipw.FloatText(value=0.03, description="Rate")
    spot_vol = ipw.FloatText(value=0.85, description="Spot vol")
    spot_mr = ipw.FloatText(value=91.0, description="Spot MR")
    lt_vol = ipw.FloatText(value=0.30, description="LT vol")
    seas_vol = ipw.FloatText(value=0.19, description="Seas vol")
    num_sims = ipw.IntText(value=4000, description="Sims")
    seed = ipw.IntText(value=12, description="Seed")
    button = ipw.Button(description="Value storage", button_style="primary")
    progress = ipw.FloatProgress(value=0.0, min=0.0, max=1.0, description="Progress")
    out = ipw.Output()

    def on_click(_):
        out.clear_output()
        progress.value = 0.0
        with out:
            try:
                results = run_valuation(
                    start.value, end.value, val_date.value, inventory.value,
                    inj_cost.value, wdr_cost.value, ratchets.value, fwd.value,
                    rate.value, spot_vol.value, spot_mr.value, lt_vol.value,
                    seas_vol.value, num_sims.value, seed.value,
                )
                progress.value = 1.0
                print(f"full NPV       {results.npv:>14,.0f}")
                print(f"intrinsic NPV  {results.intrinsic_npv:>14,.0f}")
                print(f"extrinsic NPV  {results.extrinsic_npv:>14,.0f}")
                print(f"standard error {results.val_sim_standard_error:>14,.0f}")
                try:
                    import matplotlib.pyplot as plt

                    fig, axes = plt.subplots(1, 2, figsize=(11, 3))
                    results.deltas.plot(ax=axes[0], title="Deltas")
                    results.expected_profile["inventory"].plot(
                        ax=axes[1], title="Expected inventory"
                    )
                    plt.tight_layout()
                    plt.show()
                except ImportError:
                    print("(install matplotlib for delta/profile charts)")
            except Exception as exc:  # surface input errors in the output area
                print(f"ERROR: {exc}")

    button.on_click(on_click)
    root = ipw.VBox([
        ipw.HBox([start, end, val_date]),
        ipw.HBox([inventory, inj_cost, wdr_cost]),
        ipw.HBox([ratchets, fwd]),
        ipw.HBox([rate, spot_vol, spot_mr]),
        ipw.HBox([lt_vol, seas_vol, num_sims, seed]),
        ipw.HBox([button, progress]),
        out,
    ])
    display(root)
    return root


if __name__ == "__main__":
    # Headless smoke run: value the default inputs without widgets.
    res = run_valuation(
        "2021-04-01", "2022-04-01", "2021-04-01", 1500.0, 0.01, 0.025,
        DEFAULT_RATCHETS, DEFAULT_FWD, 0.03, 0.85, 91.0, 0.30, 0.19, 2000, 12,
    )
    print(f"npv {res.npv:,.0f} (intrinsic {res.intrinsic_npv:,.0f}, "
          f"se {res.val_sim_standard_error:,.0f})")
