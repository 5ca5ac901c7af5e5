"""Motion-plausibility gate — the reference's ``motionHeuristics``.

Reference: OdometryPipeline.cpp:171-208. A relative pose delta (R_d, t_d) is
accepted iff the motion is forward-dominant and physically plausible:

- forward translation: ``t_d.z < 0``
- yaw below pi/8 (via the reference's signed ``calcYRotation``, whose
  negative branch always passes — reproduced faithfully)
- z-dominant: ``|t_z| > max(|t_x|, |t_y|)``
- bounded step: ``|t_z| < 2 * scale`` (scale = last GT-derived step length)

On rejection the previous accepted delta is replayed (the ``.5*t_s[j]``
assignment in the reference at :187-188 is dead code — overwritten at
:193-194 — so it is not reproduced). Either way the (possibly replaced)
delta is pushed into the heuristic history and composed onto the trajectory:
``t_new = R_prev @ t_d + t_prev; R_new = R_d @ R_prev``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pmv_tpu.core import geometry as geo


@jax.jit
def motion_gate(
    R_delta: jax.Array,
    t_delta: jax.Array,
    R_prev: jax.Array,
    t_prev: jax.Array,
    R_s_prev: jax.Array,
    t_s_prev: jax.Array,
    scale: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Returns (R_new, t_new, R_s_new, t_s_new, accepted)."""
    tz = t_delta[2]
    accept = (
        (tz < 0)
        & (geo.calc_y_rotation(R_delta) < jnp.pi / 8)
        & (jnp.abs(tz) > jnp.maximum(jnp.abs(t_delta[0]), jnp.abs(t_delta[1])))
        & (jnp.abs(tz) < 2.0 * scale)
    )
    R_d = jnp.where(accept, R_delta, R_s_prev)
    t_d = jnp.where(accept, t_delta, t_s_prev)
    R_new, t_new = geo.compose_delta(R_prev, t_prev, R_d, t_d)
    return R_new, t_new, R_d, t_d, accept
