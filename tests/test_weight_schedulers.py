"""RRG weight scheduler tests vs the closed forms in
/root/reference/elastic_diffusion.py:73-107."""

import numpy as np

from elasticdiffusion_tpu.sched.weight_schedulers import (
    CosineScheduler, LinearScheduler, ConstScheduler,
    make_rrg_scheduler, rrg_weight_table,
)


def test_cosine():
    s = CosineScheduler(steps=40, cosine_scale=3.0, factor=1000)
    assert s(0) == 1000  # cos(0) -> factor * 1
    assert s(40) == 0 and s(100) == 0
    t = 10
    expected = 1000 * (0.5 * (1 + np.cos(np.pi * t / 40))) ** 3.0
    assert np.isclose(s(t), expected)


def test_linear():
    s = LinearScheduler(steps=10, start_val=100, stop_val=0)
    assert s(0) == 100
    assert np.isclose(s(5), 50)
    assert s(10) == 0 and s(20) == 0


def test_const():
    s = ConstScheduler(steps=10, start_val=100, stop_val=0)
    assert s(0) == 100 and s(9) == 100 and s(10) == 0


def test_make_rrg_scheduler_steps():
    # steps = N - int(N * rrg_stop_t) (/root/reference/elastic_diffusion.py:973)
    s = make_rrg_scheduler("cosine", 50, 0.2, 1000, 3.0)
    assert s.steps == 40
    s2 = make_rrg_scheduler("linear", 50, 0.4, 500, 3.0)
    assert s2.steps == 30 and s2(0) == 500


def test_weight_table():
    s = make_rrg_scheduler("cosine", 50, 0.2, 1000, 3.0)
    w = rrg_weight_table(s, 50)
    assert w.shape == (50,)
    assert w[0] == 1000 and w[45] == 0
    assert np.all(np.diff(w[:40]) <= 0)
