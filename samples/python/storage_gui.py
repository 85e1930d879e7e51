"""Interactive storage-valuation GUI (ipywidgets) — the flagship demo.

The analog of the reference's ``samples/python/storage_gui.py`` /
``multi_factor_gui.ipynb`` widget application, re-designed for this
framework's API: a tabbed editor (Facility / Market / Model / Value) with

* a per-period **ratchet table editor** (inventory -> withdraw/inject rate
  rows, one block per effective date) with LINEAR or STEP interpolation,
  min/max-inventory + constant-rate mode for simple facilities, consumed
  percentages, inventory loss/cost, and an optional terminal-value spec;
* a **forward-curve editor** (``date value`` points, flat or linear
  interpolation to the daily grid), interest rate, settlement lag, and a
  curve chart;
* the **3-factor-seasonal model** inputs (vols, mean reversion, sims, seed,
  antithetic, basis functions, extra decisions, grid points);
* **save/load of the whole GUI state** to a JSON file (the analog of the
  reference's CSV valuation-data/curve-params round trip — one file, every
  tab);
* a Value button with **per-segment progress**, a **Cancel** button wired to
  the engine's cooperative ``cancellation_poll``, a log panel with level
  selector, and result charts (deltas, expected inventory, net volume,
  inject/withdraw trigger prices).

Usage in a notebook (ipywidgets + matplotlib are optional extras)::

    from storage_gui import StorageGui
    gui = StorageGui()
    gui.show()

``python storage_gui.py`` runs a headless smoke valuation of the default
inputs (used by CI); ``python storage_gui.py --step`` runs the step-interp
ratchet variant.
"""
from __future__ import annotations

import io
import json
import logging
import typing as tp

import numpy as np
import pandas as pd

from storage_tpu import CmdtyStorage, RatchetInterp, three_factor_seasonal_value
from storage_tpu.jobs import JobCancelledError

try:  # pragma: no cover - optional GUI dependencies
    import ipywidgets as ipw
    from IPython.display import display
except ImportError:  # pragma: no cover
    ipw = None


# --------------------------------------------------------------- defaults

DEFAULT_FWD = """2021-04-01 26.0
2021-07-01 24.5
2021-10-01 28.5
2022-01-01 34.0
2022-04-01 27.0
"""

# One block per effective date: a "@ date" header line then inventory
# withdraw inject rows (the reference GUI's ratchet sheet, as text).
DEFAULT_RATCHETS = """@ 2021-04-01
0 -150 255
2000 -200 175
5000 -261 156
"""

DEFAULT_STATE: tp.Dict[str, tp.Any] = {
    "start": "2021-04-01",
    "end": "2022-04-01",
    "val_date": "2021-04-01",
    "inventory": 1500.0,
    "injection_cost": 0.01,
    "withdrawal_cost": 0.025,
    "use_ratchets": True,
    "ratchet_interp": "linear",
    "ratchets": DEFAULT_RATCHETS,
    "min_inventory": 0.0,
    "max_inventory": 5000.0,
    "max_injection_rate": 255.0,
    "max_withdrawal_rate": 261.0,
    "cmdty_consumed_inject": 0.0,
    "cmdty_consumed_withdraw": 0.0,
    "inventory_loss": 0.0,
    "inventory_cost": 0.0,
    "terminal_spread": 0.0,  # terminal value = (spot - spread) * inventory; NaN/blank = must-be-empty
    "use_terminal": False,
    "fwd": DEFAULT_FWD,
    "fwd_interp": "flat",
    "rate": 0.03,
    "settle_lag_days": 20,
    "spot_vol": 0.85,
    "spot_mr": 91.0,
    "long_term_vol": 0.30,
    "seasonal_vol": 0.19,
    "num_sims": 4000,
    "seed": 12,
    "antithetic": False,
    "basis_funcs": "1 + x_st + x_sw + x_lt + x_st**2 + x_sw**2 + x_lt**2 + s + s**2",
    "extra_decisions": 0,
    "grid_points": 100,
}


# --------------------------------------------------------------- parsing

def parse_point_curve(text: str, start, end, freq: str = "D",
                      interp: str = "flat") -> pd.Series:
    """``date value`` lines -> a per-period curve on [start, end]:
    piecewise-flat (``interp='flat'``) or linearly interpolated in time
    (``interp='linear'``) between the listed dates."""
    rows = []
    for line in io.StringIO(text):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        date_s, value_s = line.split()
        rows.append((pd.Period(date_s, freq=freq), float(value_s)))
    if not rows:
        raise ValueError("Curve text is empty.")
    rows.sort()
    idx = pd.period_range(start, end, freq=freq)
    points = pd.Series({p: v for p, v in rows})
    if interp == "linear":
        joined = points.reindex(points.index.union(idx))
        x = joined.index.asi8.astype(float)
        known = joined.notna().to_numpy()
        joined[:] = np.interp(x, x[known], joined.to_numpy()[known])
        return joined.reindex(idx)
    return points.reindex(idx).ffill().bfill()


def parse_ratchet_blocks(text: str, default_date: str):
    """Ratchet text -> the API's per-period ``(date, [(inv, wdr, inj), ...])``
    blocks.  Lines starting ``@ <date>`` open a new effective-date block;
    plain ``inv wdr inj`` rows belong to the current block (a single undated
    table applies from ``default_date``)."""
    blocks: tp.List[tp.Tuple[str, tp.List[tp.Tuple[float, float, float]]]] = []
    current_date = None
    current_rows: tp.List[tp.Tuple[float, float, float]] = []

    def flush():
        if current_rows:
            blocks.append((current_date or default_date, list(current_rows)))

    for line in io.StringIO(text):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        if line.startswith("@"):
            flush()
            current_date = line[1:].strip()
            current_rows = []
            continue
        inv, wdr, inj = (float(x) for x in line.split())
        current_rows.append((inv, wdr, inj))
    flush()
    if not blocks:
        raise ValueError("Ratchet table is empty.")
    return blocks


def ratchet_blocks_to_text(blocks) -> str:
    out = []
    for date, rows in blocks:
        out.append(f"@ {date}")
        out.extend(f"{inv} {wdr} {inj}" for inv, wdr, inj in rows)
    return "\n".join(out) + "\n"


# --------------------------------------------------------------- valuation

def build_storage(state: tp.Dict[str, tp.Any]) -> CmdtyStorage:
    """GUI state -> a CmdtyStorage (ratcheted or simple constant-rate)."""
    kwargs: tp.Dict[str, tp.Any] = dict(
        freq="D",
        storage_start=state["start"],
        storage_end=state["end"],
        injection_cost=state["injection_cost"],
        withdrawal_cost=state["withdrawal_cost"],
        cmdty_consumed_inject=state["cmdty_consumed_inject"] or None,
        cmdty_consumed_withdraw=state["cmdty_consumed_withdraw"] or None,
        inventory_loss=state["inventory_loss"] or None,
        inventory_cost=state["inventory_cost"] or None,
    )
    if state.get("use_terminal"):
        spread = float(state["terminal_spread"])
        kwargs["terminal_storage_npv"] = lambda price, inv: (price - spread) * inv
    if state["use_ratchets"]:
        kwargs["ratchets"] = parse_ratchet_blocks(state["ratchets"], state["start"])
        kwargs["ratchet_interp"] = (
            RatchetInterp.STEP if state["ratchet_interp"] == "step"
            else RatchetInterp.LINEAR
        )
    else:
        kwargs.update(
            min_inventory=state["min_inventory"],
            max_inventory=state["max_inventory"],
            max_injection_rate=state["max_injection_rate"],
            max_withdrawal_rate=state["max_withdrawal_rate"],
        )
    return CmdtyStorage(**kwargs)


def run_valuation(state: tp.Dict[str, tp.Any],
                  on_progress: tp.Optional[tp.Callable[[float], None]] = None,
                  cancellation_poll: tp.Optional[tp.Callable[[], bool]] = None):
    """Build facility + market from a GUI state dict and value it."""
    storage = build_storage(state)
    fwd = parse_point_curve(
        state["fwd"], state["start"], state["end"], interp=state["fwd_interp"]
    )
    lag = int(state["settle_lag_days"])

    def settle(period: pd.Period):
        return (period.asfreq("M").asfreq("D", "end") + lag).start_time.date()

    return three_factor_seasonal_value(
        storage, state["val_date"], state["inventory"], fwd,
        float(state["rate"]), settle,
        spot_mean_reversion=float(state["spot_mr"]),
        spot_vol=float(state["spot_vol"]),
        long_term_vol=float(state["long_term_vol"]),
        seasonal_vol=float(state["seasonal_vol"]),
        num_sims=int(state["num_sims"]),
        basis_funcs=state["basis_funcs"],
        discount_deltas=False,
        seed=int(state["seed"]),
        antithetic=bool(state["antithetic"]),
        extra_decisions=int(state["extra_decisions"]) or None,
        num_inventory_grid_points=int(state["grid_points"]),
        on_progress_update=on_progress,
        cancellation_poll=cancellation_poll,
    )


def save_state(state: tp.Dict[str, tp.Any], path: str) -> None:
    with open(path, "w") as f:
        json.dump(state, f, indent=2)


def load_state(path: str) -> tp.Dict[str, tp.Any]:
    with open(path) as f:
        loaded = json.load(f)
    state = dict(DEFAULT_STATE)
    state.update({k: v for k, v in loaded.items() if k in DEFAULT_STATE})
    return state


# --------------------------------------------------------------- widgets

class _OutputLogHandler(logging.Handler):  # pragma: no cover - interactive
    """Route the framework's ``storage_tpu.*`` log records into a widget."""

    def __init__(self, out):
        super().__init__()
        self.out = out
        self.setFormatter(logging.Formatter("%(levelname)s %(name)s: %(message)s"))

    def emit(self, record):
        with self.out:
            print(self.format(record))


class StorageGui:  # pragma: no cover - interactive
    """Tabbed widget application; ``StorageGui().show()`` in a notebook."""

    def __init__(self, state: tp.Optional[tp.Dict[str, tp.Any]] = None):
        if ipw is None:
            raise ImportError(
                "storage_gui needs ipywidgets (and a notebook front-end): "
                "pip install ipywidgets matplotlib"
            )
        self.state = dict(DEFAULT_STATE)
        if state:
            self.state.update(state)
        self._cancel = False
        self._build()

    # -- construction
    def _build(self):
        s = self.state
        w = self.w = {}
        # Facility tab
        w["start"] = ipw.Text(value=s["start"], description="Start")
        w["end"] = ipw.Text(value=s["end"], description="End")
        w["inventory"] = ipw.FloatText(value=s["inventory"], description="Inventory")
        w["injection_cost"] = ipw.FloatText(value=s["injection_cost"], description="Inj cost")
        w["withdrawal_cost"] = ipw.FloatText(value=s["withdrawal_cost"], description="Wdr cost")
        w["use_ratchets"] = ipw.Checkbox(value=s["use_ratchets"], description="Ratchets")
        w["ratchet_interp"] = ipw.Dropdown(
            options=["linear", "step"], value=s["ratchet_interp"],
            description="Ratchet interp",
        )
        w["ratchets"] = ipw.Textarea(
            value=s["ratchets"], description="Ratchet table",
            layout=ipw.Layout(height="140px", width="420px"),
        )
        w["min_inventory"] = ipw.FloatText(value=s["min_inventory"], description="Min inv")
        w["max_inventory"] = ipw.FloatText(value=s["max_inventory"], description="Max inv")
        w["max_injection_rate"] = ipw.FloatText(value=s["max_injection_rate"], description="Max inj")
        w["max_withdrawal_rate"] = ipw.FloatText(value=s["max_withdrawal_rate"], description="Max wdr")
        w["cmdty_consumed_inject"] = ipw.FloatText(value=s["cmdty_consumed_inject"], description="Consumed inj %")
        w["cmdty_consumed_withdraw"] = ipw.FloatText(value=s["cmdty_consumed_withdraw"], description="Consumed wdr %")
        w["inventory_loss"] = ipw.FloatText(value=s["inventory_loss"], description="Inv loss %")
        w["inventory_cost"] = ipw.FloatText(value=s["inventory_cost"], description="Inv cost")
        w["use_terminal"] = ipw.Checkbox(value=s["use_terminal"], description="Terminal value")
        w["terminal_spread"] = ipw.FloatText(value=s["terminal_spread"], description="Term spread")
        facility = ipw.VBox([
            ipw.HBox([w["start"], w["end"], w["inventory"]]),
            ipw.HBox([w["injection_cost"], w["withdrawal_cost"]]),
            ipw.HBox([w["use_ratchets"], w["ratchet_interp"]]),
            w["ratchets"],
            ipw.HBox([w["min_inventory"], w["max_inventory"]]),
            ipw.HBox([w["max_injection_rate"], w["max_withdrawal_rate"]]),
            ipw.HBox([w["cmdty_consumed_inject"], w["cmdty_consumed_withdraw"]]),
            ipw.HBox([w["inventory_loss"], w["inventory_cost"]]),
            ipw.HBox([w["use_terminal"], w["terminal_spread"]]),
        ])

        # Market tab
        w["fwd"] = ipw.Textarea(
            value=s["fwd"], description="Fwd points",
            layout=ipw.Layout(height="140px", width="420px"),
        )
        w["fwd_interp"] = ipw.Dropdown(
            options=["flat", "linear"], value=s["fwd_interp"],
            description="Curve interp",
        )
        w["rate"] = ipw.FloatText(value=s["rate"], description="Rate")
        w["settle_lag_days"] = ipw.IntText(value=s["settle_lag_days"], description="Settle lag d")
        plot_curve = ipw.Button(description="Plot curve")
        self.curve_out = ipw.Output()
        plot_curve.on_click(self._on_plot_curve)
        market = ipw.VBox([
            ipw.HBox([w["fwd"], ipw.VBox([w["fwd_interp"], w["rate"],
                                          w["settle_lag_days"], plot_curve])]),
            self.curve_out,
        ])

        # Model tab
        w["val_date"] = ipw.Text(value=s["val_date"], description="Val date")
        w["spot_vol"] = ipw.FloatText(value=s["spot_vol"], description="Spot vol")
        w["spot_mr"] = ipw.FloatText(value=s["spot_mr"], description="Spot MR")
        w["long_term_vol"] = ipw.FloatText(value=s["long_term_vol"], description="LT vol")
        w["seasonal_vol"] = ipw.FloatText(value=s["seasonal_vol"], description="Seas vol")
        w["num_sims"] = ipw.IntText(value=s["num_sims"], description="Sims")
        w["seed"] = ipw.IntText(value=s["seed"], description="Seed")
        w["antithetic"] = ipw.Checkbox(value=s["antithetic"], description="Antithetic")
        w["basis_funcs"] = ipw.Text(
            value=s["basis_funcs"], description="Basis",
            layout=ipw.Layout(width="560px"),
        )
        w["extra_decisions"] = ipw.IntText(value=s["extra_decisions"], description="Extra dec")
        w["grid_points"] = ipw.IntText(value=s["grid_points"], description="Grid pts")
        model = ipw.VBox([
            ipw.HBox([w["val_date"], w["num_sims"], w["seed"], w["antithetic"]]),
            ipw.HBox([w["spot_vol"], w["spot_mr"]]),
            ipw.HBox([w["long_term_vol"], w["seasonal_vol"]]),
            w["basis_funcs"],
            ipw.HBox([w["extra_decisions"], w["grid_points"]]),
        ])

        # Value tab
        self.value_btn = ipw.Button(description="Value storage", button_style="primary")
        self.cancel_btn = ipw.Button(description="Cancel", button_style="danger",
                                     disabled=True)
        self.progress = ipw.FloatProgress(value=0.0, min=0.0, max=1.0,
                                          description="Progress")
        self.result_out = ipw.Output()
        self.value_btn.on_click(self._on_value)
        self.cancel_btn.on_click(self._on_cancel)
        run_tab = ipw.VBox([
            ipw.HBox([self.value_btn, self.cancel_btn, self.progress]),
            self.result_out,
        ])

        # file round-trip + logs (shared footer)
        self.path = ipw.Text(value="storage_gui_state.json", description="File")
        save_btn = ipw.Button(description="Save inputs")
        load_btn = ipw.Button(description="Load inputs")
        save_btn.on_click(self._on_save)
        load_btn.on_click(self._on_load)
        self.log_out = ipw.Output(layout=ipw.Layout(
            max_height="160px", overflow="auto"))
        self.log_level = ipw.Dropdown(
            options=["WARNING", "INFO", "DEBUG"], value="INFO",
            description="Log level",
        )
        self._handler = _OutputLogHandler(self.log_out)
        logger = logging.getLogger("storage_tpu")
        # Re-running the construction cell must not accumulate handlers
        # (duplicated log lines + dead Output widgets kept alive).
        for h in list(logger.handlers):
            if getattr(h, "_storage_gui_handler", False):
                logger.removeHandler(h)
        self._handler._storage_gui_handler = True
        logger.addHandler(self._handler)
        logger.setLevel(logging.INFO)
        self.log_level.observe(self._on_log_level, names="value")
        clear_btn = ipw.Button(description="Clear logs")
        clear_btn.on_click(lambda _b: self.log_out.clear_output())

        tabs = ipw.Tab(children=[facility, market, model, run_tab])
        for i, title in enumerate(["Facility", "Market", "Model", "Value"]):
            tabs.set_title(i, title)
        self.root = ipw.VBox([
            tabs,
            ipw.HBox([self.path, save_btn, load_btn]),
            ipw.HBox([self.log_level, clear_btn]),
            self.log_out,
        ])

    # -- state sync
    def _pull_state(self) -> tp.Dict[str, tp.Any]:
        for key, widget in self.w.items():
            self.state[key] = widget.value
        return dict(self.state)

    def _push_state(self):
        for key, widget in self.w.items():
            if key in self.state:
                widget.value = self.state[key]

    # -- handlers
    def _on_log_level(self, change):
        logging.getLogger("storage_tpu").setLevel(change["new"])

    def _on_save(self, _b):
        with self.log_out:
            try:
                save_state(self._pull_state(), self.path.value)
                print(f"saved inputs -> {self.path.value}")
            except Exception as exc:  # noqa: BLE001 - surface to the panel
                print(f"SAVE ERROR: {exc}")

    def _on_load(self, _b):
        with self.log_out:
            try:
                self.state = load_state(self.path.value)
                self._push_state()
                print(f"loaded inputs <- {self.path.value}")
            except Exception as exc:  # noqa: BLE001
                print(f"LOAD ERROR: {exc}")

    def _on_plot_curve(self, _b):
        self.curve_out.clear_output()
        state = self._pull_state()
        with self.curve_out:
            try:
                curve = parse_point_curve(
                    state["fwd"], state["start"], state["end"],
                    interp=state["fwd_interp"],
                )
                import matplotlib.pyplot as plt

                curve.plot(title="Daily forward curve", figsize=(8, 2.5))
                plt.tight_layout()
                plt.show()
            except ImportError:
                print(curve.describe())
            except Exception as exc:  # noqa: BLE001
                print(f"ERROR: {exc}")

    def _on_cancel(self, _b):
        self._cancel = True

    def _on_value(self, _b):
        # The valuation runs on a WORKER THREAD: widget events (including the
        # Cancel click) are processed on the kernel's single-threaded loop,
        # so a synchronous valuation could never observe self._cancel.
        import threading

        state = self._pull_state()
        self.result_out.clear_output()
        self.progress.value = 0.0
        self._cancel = False
        self.cancel_btn.disabled = False
        self.value_btn.disabled = True

        def work():
            with self.result_out:
                try:
                    results = run_valuation(
                        state,
                        on_progress=lambda f: setattr(self.progress, "value", f),
                        cancellation_poll=lambda: self._cancel,
                    )
                    self._show_results(results)
                except JobCancelledError:
                    print("CANCELLED")
                except Exception as exc:  # noqa: BLE001
                    print(f"ERROR: {exc}")
                finally:
                    self.cancel_btn.disabled = True
                    self.value_btn.disabled = False

        threading.Thread(target=work, name="storage-gui-valuation",
                         daemon=True).start()

    def _show_results(self, results):
        print(f"full NPV       {results.npv:>14,.0f}")
        print(f"intrinsic NPV  {results.intrinsic_npv:>14,.0f}")
        print(f"extrinsic NPV  {results.extrinsic_npv:>14,.0f}")
        print(f"standard error {results.val_sim_standard_error:>14,.0f}")
        try:
            import matplotlib.pyplot as plt

            fig, axes = plt.subplots(2, 2, figsize=(11, 6))
            results.deltas.plot(ax=axes[0, 0], title="Deltas")
            results.expected_profile["inventory"].plot(
                ax=axes[0, 1], title="Expected inventory"
            )
            results.expected_profile["net_volume"].plot(
                ax=axes[1, 0], title="Expected net volume"
            )
            tp_frame = results.trigger_prices
            tp_frame["inject_trigger_price"].plot(
                ax=axes[1, 1], label="inject", title="Trigger prices"
            )
            tp_frame["withdraw_trigger_price"].plot(ax=axes[1, 1], label="withdraw")
            axes[1, 1].legend()
            plt.tight_layout()
            plt.show()
        except ImportError:
            print("(install matplotlib for charts)")

    def show(self):
        display(self.root)
        return self.root


def build_gui(state=None):  # pragma: no cover - interactive
    """Assemble and display the widget GUI (back-compat helper)."""
    return StorageGui(state).show()


# --------------------------------------------------------------- headless

def headless_smoke(step_interp: bool = False) -> None:
    """Value the default inputs without widgets (CI-able), exercising the
    ratchet table + save/load round trip; ``step_interp`` switches the
    ratchet interpolation to STEP (terminal value required by the builder
    rules for step ratchets)."""
    import tempfile

    state = dict(DEFAULT_STATE)
    state["num_sims"] = 2000
    if step_interp:
        state["ratchet_interp"] = "step"
        state["use_terminal"] = True
        state["terminal_spread"] = 0.5
        # Step constraints require the top two ratchet rows to share rates
        # (StepInjectWithdrawConstraint validation).
        state["ratchets"] = (
            "@ 2021-04-01\n0 -150 255\n2000 -200 175\n5000 -200 175\n"
        )
    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as f:
        path = f.name
    save_state(state, path)
    state = load_state(path)
    fractions: tp.List[float] = []
    res = run_valuation(state, on_progress=fractions.append)
    assert fractions and fractions[-1] == 1.0
    label = "step" if step_interp else "linear"
    print(
        f"[{label} ratchets] npv {res.npv:,.0f} "
        f"(intrinsic {res.intrinsic_npv:,.0f}, "
        f"se {res.val_sim_standard_error:,.0f}, "
        f"{len(fractions)} progress ticks)"
    )


if __name__ == "__main__":
    import sys

    headless_smoke(step_interp="--step" in sys.argv)
