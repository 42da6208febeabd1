"""Dynamics (second-order ODE smoother): convergence, critical damping, parity
between the host-side DynamicNumber and the batched lax.scan form."""

import numpy as np
import pytest

from shaderflow_tpu.ops.dynamics import Coefficients, DynamicNumber, scan, step


def test_converges_to_target():
    d = DynamicNumber(value=0.0, frequency=2.0, zeta=1.0)
    for _ in range(600):
        d.next(target=1.0, dt=1 / 60)
    assert float(d.value) == pytest.approx(1.0, abs=1e-4)


def test_critical_damping_no_overshoot():
    d = DynamicNumber(value=0.0, frequency=1.0, zeta=1.0)
    peak = 0.0
    for _ in range(600):
        peak = max(peak, float(d.next(target=1.0, dt=1 / 60)))
    assert peak <= 1.0 + 1e-3


def test_underdamped_overshoots():
    d = DynamicNumber(value=0.0, frequency=1.0, zeta=0.2)
    peak = 0.0
    for _ in range(600):
        peak = max(peak, float(d.next(target=1.0, dt=1 / 60)))
    assert peak > 1.2


def test_vectorized_state():
    d = DynamicNumber(value=np.zeros(4), frequency=3.0)
    d.next(target=np.array([1.0, 2.0, 3.0, 4.0]), dt=0.1)
    assert d.value.shape == (4,)


def test_integral_accumulates():
    d = DynamicNumber(value=1.0, frequency=2.0, integrate=True)
    for _ in range(60):
        d.next(target=1.0, dt=1 / 60)
    # Settled at 1.0 for 1 second -> integral ~ 1
    assert float(d.integral) == pytest.approx(1.0, abs=0.05)


def test_precision_early_out():
    d = DynamicNumber(value=5.0, frequency=2.0, precision=1e-6)
    v0 = d.next(target=5.0, dt=0.1)
    assert float(v0) == 5.0


def test_pole_matching_branch_stable():
    # High frequency * large dt triggers the pole-matching branch
    coeffs = Coefficients.compute(frequency=100.0, zeta=1.0, response=0.0, dt=0.1)
    assert np.isfinite(coeffs.k1) and np.isfinite(coeffs.k2)
    d = DynamicNumber(value=0.0, frequency=100.0, zeta=1.0)
    for _ in range(50):
        d.next(target=1.0, dt=0.1)
    assert float(d.value) == pytest.approx(1.0, abs=1e-3)


def test_scan_matches_host_stepper():
    dt = 1 / 60
    targets = np.sin(np.linspace(0, 6, 120)).astype(np.float32)
    values = np.asarray(scan(targets, 0.0, dt, frequency=4.0, zeta=0.7, response=0.1))

    d = DynamicNumber(value=0.0, frequency=4.0, zeta=0.7, response=0.1, precision=0.0,
                      dtype=np.float32)
    host = []
    for t in targets:
        host.append(float(d.next(target=float(t), dt=dt)))
    np.testing.assert_allclose(values, host, atol=1e-4)


def test_functional_step_matches_class():
    coeffs = Coefficients.compute(2.0, 1.0, 0.0, 1 / 60)
    v, dv, prev = 0.0, 0.0, 0.0
    d = DynamicNumber(value=0.0, frequency=2.0, zeta=1.0, precision=0.0)
    for i in range(30):
        target = float(np.sin(i / 5))
        v, dv, prev = step(v, dv, prev, target, 1 / 60, coeffs)
        d.next(target=target, dt=1 / 60)
    assert float(d.value) == pytest.approx(v, abs=1e-9)
