"""
ShaderDynamics — the second-order smoother as a scene module.

Role-equivalent of the reference module half of dynamics
(/root/reference/shaderflow/dynamics.py:251-297): wraps the core
DynamicNumber (ops/dynamics.py) so it steps once per frame on scene.dt (or
the real rdt when real=True), infers its GLSL uniform type from the value
shape, and exports `Name` / `NameIntegral` / `NameDerivative` uniforms.
"""

from __future__ import annotations

from typing import Iterable, Optional

import numpy as np

from shaderflow_tpu.module import ShaderModule
from shaderflow_tpu.ops.dynamics import DynamicNumber
from shaderflow_tpu.variable import ShaderVariable, Uniform


class ShaderDynamics(ShaderModule, DynamicNumber):

    def __init__(
        self,
        scene=None,
        name: str = "iShaderDynamics",
        *,
        real: bool = False,
        primary: bool = True,
        differentiate: bool = False,
        value=0.0,
        target=None,
        frequency: float = 1.0,
        zeta: float = 1.0,
        response: float = 0.0,
        precision: float = 1e-6,
        integrate: bool = False,
        dtype=np.float64,
        **kwargs,
    ):
        self.real = real
        self.primary = primary
        self.differentiate = differentiate
        DynamicNumber.__init__(
            self, value=value, target=target, frequency=frequency, zeta=zeta,
            response=response, precision=precision, integrate=integrate, dtype=dtype)
        ShaderModule.__init__(self, scene=scene, name=name, **kwargs)

    def setup(self) -> None:
        self.reset(instant=self.scene.freewheel)

    def update(self) -> None:
        # abs(dt): the system is unstable backwards in time
        self.next(dt=abs(self.scene.rdt if self.real else self.scene.dt))
        # HUD plot history (numpy host values only — a device value here
        # would turn the append into a readback)
        if isinstance(self.value, (int, float, np.generic, np.ndarray)):
            history = getattr(self, "_ui_history", None)
            if history is None:
                from collections import deque
                history = self._ui_history = deque(maxlen=240)
            history.append(float(np.asarray(self.value).reshape(-1)[0]))

    @property
    def type(self) -> Optional[str]:
        shape = np.shape(self.value)
        if not shape or shape[0] == 1:
            return "float"
        if shape[0] in (2, 3, 4):
            return f"vec{shape[0]}"
        return None

    def ui(self):
        import numpy as np
        value = np.asarray(self.value).reshape(-1)
        yield f"f={self.frequency:.2f}  z={self.zeta:.2f}  r={self.response:.2f}"
        yield "value " + " ".join(f"{v:+.3f}" for v in value[:4])

    def ui_plots(self):
        from shaderflow_tpu.module import UIPlot
        history = getattr(self, "_ui_history", None)
        return [UIPlot("value", list(history))] if history else []

    def ui_fields(self):
        from shaderflow_tpu.module import UIField

        def setter(attr):
            def set(value):
                setattr(self, attr, value)
            return set

        # f = 0 would freeze the system solid (k1/k2 blow up); keep strictly
        # positive. zeta/response may be anything the reference's sliders
        # allow (zeta < 0 self-oscillates, response < 0 anticipates).
        return [
            UIField("f", lambda: self.frequency, setter("frequency"),
                    step=0.1, minimum=0.01),
            UIField("zeta", lambda: self.zeta, setter("zeta"), step=0.1),
            UIField("response", lambda: self.response, setter("response"),
                    step=0.1),
        ]

    def pipeline(self) -> Iterable[ShaderVariable]:
        kind = self.type
        if not kind:
            return
        if self.primary:
            yield self.uniform(kind, self.name, self.value)
        if self.integrate:
            yield self.uniform(kind, f"{self.name}Integral", self.integral)
        if self.differentiate:
            yield self.uniform(kind, f"{self.name}Derivative", self.derivative)
