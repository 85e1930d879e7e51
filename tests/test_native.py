"""Native runtime tests: C++ inventory-space reduction equals the Python path
bit-for-bit, and the async job engine implements the reference's calc-wrapper
state machine (pending/running/success/error/cancelled + progress + cancel)."""
import time

import numpy as np
import pandas as pd
import pytest

from storage_tpu import CmdtyStorage, RatchetInterp
from storage_tpu.grid import calculate_inventory_space
from storage_tpu import native


requires_native = pytest.mark.skipif(
    native.load() is None, reason="native library unavailable"
)


def make_ratcheted(n_days=200):
    start = pd.Period("2021-01-01", freq="D")
    ratchets = [
        (start, [(0.0, -40.0, 55.0), (500.0, -45.0, 50.0), (1000.0, -48.0, 46.0)]),
        (start + n_days // 2, [(0.0, -30.0, 45.0), (500.0, -35.0, 42.0), (1000.0, -38.0, 40.0)]),
    ]
    return CmdtyStorage(
        "D", start, start + n_days, 0.5, 0.4,
        ratchets=ratchets, ratchet_interp=RatchetInterp.LINEAR,
        inventory_loss=0.0005,
    )


class TestNativeInventorySpace:
    @requires_native
    def test_matches_python_exactly_ratcheted(self):
        storage = make_ratcheted()
        lo_py, hi_py = calculate_inventory_space(storage, 300.0, storage.start, use_native=False)
        lo_cc, hi_cc = calculate_inventory_space(storage, 300.0, storage.start, use_native=True)
        np.testing.assert_array_equal(lo_py, lo_cc)
        np.testing.assert_array_equal(hi_py, hi_cc)

    @requires_native
    def test_matches_python_exactly_simple(self):
        storage = CmdtyStorage(
            "D", "2021-01-01", "2021-06-01", 0.5, 0.4,
            min_inventory=0.0, max_inventory=2000.0,
            max_injection_rate=80.0, max_withdrawal_rate=90.0,
        )
        lo_py, hi_py = calculate_inventory_space(storage, 100.0, "2021-01-01", use_native=False)
        lo_cc, hi_cc = calculate_inventory_space(storage, 100.0, "2021-01-01", use_native=True)
        np.testing.assert_array_equal(lo_py, lo_cc)
        np.testing.assert_array_equal(hi_py, hi_cc)

    @requires_native
    def test_matches_python_step_ratchets(self):
        start = pd.Period("2021-01-01", freq="D")
        ratchets = [
            (start, [(0.0, -40.0, 55.0), (500.0, -45.0, 50.0), (1000.0, -45.0, 50.0)]),
        ]
        storage = CmdtyStorage(
            "D", start, start + 120, 0.5, 0.4,
            ratchets=ratchets, ratchet_interp=RatchetInterp.STEP,
            terminal_storage_npv=lambda p, i: 0.0,
        )
        lo_py, hi_py = calculate_inventory_space(storage, 300.0, start, use_native=False)
        lo_cc, hi_cc = calculate_inventory_space(storage, 300.0, start, use_native=True)
        np.testing.assert_array_equal(lo_py, lo_cc)
        np.testing.assert_array_equal(hi_py, hi_cc)

    @requires_native
    def test_infeasible_raises_same_error(self):
        from storage_tpu import InventoryConstraintsCannotBeFulfilledException

        storage = CmdtyStorage(
            "D", "2021-01-01", "2021-01-11", 0.0, 0.0,
            min_inventory=0.0, max_inventory=1000.0,
            max_injection_rate=10.0, max_withdrawal_rate=10.0,
        )
        for flag in (False, True):
            with pytest.raises(InventoryConstraintsCannotBeFulfilledException):
                calculate_inventory_space(storage, 900.0, "2021-01-01", use_native=flag)


class TestJobEngine:
    @requires_native
    def test_submit_and_result(self):
        from storage_tpu.jobs import ValuationJobEngine, JobStatus

        with ValuationJobEngine(num_threads=2) as engine:
            job = engine.submit(lambda ctl: 41 + 1)
            assert job.result() == 42
            assert job.status == JobStatus.SUCCESS
            assert job.progress == 1.0

    @requires_native
    def test_error_propagates(self):
        from storage_tpu.jobs import ValuationJobEngine, JobStatus

        def boom(ctl):
            raise ValueError("bad curve")

        with ValuationJobEngine(num_threads=1) as engine:
            job = engine.submit(boom)
            with pytest.raises(ValueError, match="bad curve"):
                job.result()
            assert job.status == JobStatus.ERROR

    @requires_native
    def test_progress_and_cancellation(self):
        from storage_tpu.jobs import JobCancelledError, JobStatus, ValuationJobEngine

        started = []

        def slow(ctl):
            for i in range(200):
                started.append(i)
                ctl.report_progress(i / 200.0)  # raises once cancel requested
                time.sleep(0.01)
            return "done"

        with ValuationJobEngine(num_threads=1) as engine:
            job = engine.submit(slow)
            deadline = time.time() + 5
            while not started and time.time() < deadline:
                time.sleep(0.005)
            job.cancel()
            with pytest.raises(JobCancelledError):
                job.result()
            assert job.status == JobStatus.CANCELLED
            assert 0.0 <= job.progress < 1.0

    @requires_native
    def test_parallel_jobs(self):
        from storage_tpu.jobs import ValuationJobEngine

        def work(k):
            def fn(ctl):
                time.sleep(0.05)
                return k * k
            return fn

        with ValuationJobEngine(num_threads=4) as engine:
            jobs = [engine.submit(work(k)) for k in range(8)]
            assert [j.result() for j in jobs] == [k * k for k in range(8)]
