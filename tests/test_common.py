"""Common substrate tests (model: common/task_test.cc, thread_pool_test.cc,
fixed_ratio_sampler, blocking_queue_test.cc)."""

import threading

import numpy as np
import pytest

from cartographer_tpu.common import FixedRatioSampler, Task, ThreadPool
from cartographer_tpu.common.blocking_queue import BlockingQueue
from cartographer_tpu.common.config import (
    MapBuilderOptions,
    TrajectoryBuilder2DOptions,
)
from cartographer_tpu.common.math import normalize_angle_difference, round_to_int
from cartographer_tpu.mapping import probability_values as pv


class TestMath:
    def test_normalize_angle(self):
        assert normalize_angle_difference(0.0) == 0.0
        assert normalize_angle_difference(np.pi) == pytest.approx(np.pi)
        assert abs(normalize_angle_difference(-np.pi)) == pytest.approx(np.pi)
        assert normalize_angle_difference(3 * np.pi) == pytest.approx(np.pi)
        assert normalize_angle_difference(2 * np.pi) == pytest.approx(0.0, abs=1e-12)

    def test_round_to_int(self):
        assert round_to_int(0.4) == 0
        assert round_to_int(0.5) == 1
        assert round_to_int(-0.5) == -1 or round_to_int(-0.5) == 0  # half away/even
        np.testing.assert_array_equal(round_to_int(np.array([1.4, 1.6])), [1, 2])


class TestProbabilityValues:
    def test_odds_roundtrip(self):
        for p in [0.1, 0.3, 0.5, 0.55, 0.9]:
            assert pv.probability_from_odds(pv.odds(p)) == pytest.approx(p)

    def test_log_odds_update_matches_reference_formula(self):
        # new_p = clamp(odds^-1(odds(hit) * odds(p)))  -- probability_values.h
        hit, p = 0.55, 0.5
        expected = pv.clamp_probability(
            pv.probability_from_odds(pv.odds(hit) * pv.odds(p))
        )
        l = pv.log_odds(np.float64(p))
        l2 = pv.apply_odds_update(l, pv.hit_update_log_odds(hit))
        assert pv.probability_from_log_odds(l2) == pytest.approx(expected, abs=1e-12)

    def test_clamping(self):
        l = pv.log_odds(np.float64(0.89))
        for _ in range(100):
            l = pv.apply_odds_update(l, pv.hit_update_log_odds(0.55))
        assert pv.probability_from_log_odds(l) == pytest.approx(0.9, abs=1e-9)

    def test_miss_update(self):
        l = pv.log_odds(np.float64(0.5))
        l2 = pv.apply_odds_update(l, pv.miss_update_log_odds(0.49))
        expected = pv.probability_from_odds(pv.odds(0.49) * pv.odds(0.5))
        assert pv.probability_from_log_odds(l2) == pytest.approx(expected, abs=1e-12)


class TestConfig:
    def test_defaults_match_reference(self):
        opts = TrajectoryBuilder2DOptions()
        assert opts.max_range == 30.0
        assert opts.submaps.num_range_data == 90
        assert opts.submaps.range_data_inserter.probability_grid_range_data_inserter.hit_probability == 0.55
        assert opts.ceres_scan_matcher.rotation_weight == 40.0

    def test_from_dict_partial_override(self):
        opts = TrajectoryBuilder2DOptions.from_dict(
            {"max_range": 25.0, "submaps": {"num_range_data": 10}}
        )
        assert opts.max_range == 25.0
        assert opts.submaps.num_range_data == 10
        assert opts.min_range == 0.0  # default preserved

    def test_unknown_key_is_error(self):
        with pytest.raises(KeyError):
            TrajectoryBuilder2DOptions.from_dict({"not_a_key": 1})

    def test_map_builder_defaults(self):
        opts = MapBuilderOptions()
        assert opts.pose_graph.optimize_every_n_nodes == 90
        assert opts.pose_graph.constraint_builder.min_score == 0.55
        assert opts.pose_graph.constraint_builder.fast_correlative_scan_matcher.branch_and_bound_depth == 7


class TestFixedRatioSampler:
    def test_ratio(self):
        sampler = FixedRatioSampler(0.3)
        pulses = [sampler.pulse() for _ in range(1000)]
        assert sum(pulses) == pytest.approx(300, abs=1)

    def test_always(self):
        sampler = FixedRatioSampler(1.0)
        assert all(sampler.pulse() for _ in range(100))


class TestTaskThreadPool:
    def test_inline_execution_order(self):
        pool = ThreadPool(0)
        order = []
        a = Task(lambda: order.append("a"))
        b = Task(lambda: order.append("b"))
        b.add_dependency(a)
        pool.schedule(b)
        pool.schedule(a)
        assert order == ["a", "b"]

    def test_threaded_dependencies(self):
        pool = ThreadPool(2)
        try:
            done = threading.Event()
            order = []
            lock = threading.Lock()

            def push(x, ev=None):
                with lock:
                    order.append(x)
                if ev:
                    ev.set()

            a = Task(lambda: push("a"))
            b = Task(lambda: push("b"))
            c = Task(lambda: push("c", done))
            b.add_dependency(a)
            c.add_dependency(b)
            pool.schedule(c)
            pool.schedule(b)
            pool.schedule(a)
            assert done.wait(timeout=10.0)
            assert order == ["a", "b", "c"]
        finally:
            pool.shutdown()


class TestBlockingQueue:
    def test_fifo(self):
        q = BlockingQueue()
        q.push(1)
        q.push(2)
        assert q.pop() == 1
        assert q.pop() == 2

    def test_timeout(self):
        q = BlockingQueue()
        assert q.pop_with_timeout(0.01) is None

    def test_bounded(self):
        q = BlockingQueue(queue_size=1)
        q.push(1)
        assert not q.push_with_timeout(2, timeout=0.01)
        assert q.pop() == 1
