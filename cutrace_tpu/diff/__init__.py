"""Differentiable rendering: parameter views, losses, training steps.

Capability the CUDA reference lacks entirely (SURVEY.md north star): the
whole forward pipeline (ops.intersect + render.shading) is built from
jit/grad-transformable JAX ops, so scene parameters — geometry, materials,
lights, camera — can be optimized against image losses.
"""

from cutrace_tpu.diff.grad import (  # noqa: F401
    DIFFERENTIABLE_FIELDS,
    extract_params,
    with_params,
    render_loss,
    grad_render_loss,
)
