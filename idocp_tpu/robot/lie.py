"""SO(3)/SE(3) Lie-group operations for floating-base configuration spaces.

TPU-native analogue of the reference's Pinocchio Lie-group layer
(idocp `robot/robot.hpp`: integrate/difference/dIntegrate, SURVEY.md L1):
pure jnp functions, dtype-polymorphic, autodiff-safe at the identity
(Taylor-guarded small-angle branches use the double-`where` pattern so
gradients never see 0/0).

Conventions (DESIGN.md): quaternions scalar-first (w, x, y, z); twists
angular-first [omega(3), v(3)]; local (body-frame) integration
X' = X * Exp6(xi).
"""
from __future__ import annotations

import jax.numpy as jnp

# theta^2 crossover below which Taylor expansions are used. 0.02 is
# dtype-INDEPENDENT by design: the 5-term Taylor kernels below truncate at
# < 1e-16 there (safe for f64), while the exact branches only ever run at
# theta >= 0.14 where their cancellations (1 - cos, 1 - A/2B, ...) retain
# full relative precision even in f32. A tiny threshold (the classic 1e-12)
# is an f32 landmine: cos(1e-6) rounds to exactly 1.0 in f32, so the exact
# branch returns 0/theta^2 = 0 or Inf/NaN — the round-1 f32 trot NaN.
_EPS2 = 0.02


def _safe_sqrt(x2):
    """sqrt with a nonzero-gradient guard at x2 == 0."""
    return jnp.sqrt(jnp.where(x2 < _EPS2, 1.0, x2))


# --- f64-accurate trigonometry -------------------------------------------
# XLA's f64 sin/cos/atan2 in this environment are only f32-accurate outside
# the primary range (~1e-8 abs error: approximate range reduction). We do a
# Cody-Waite 2-term reduction to r in [-pi/4, pi/4] and evaluate Taylor
# kernels there (error < 1e-15 for our bounded angles).

_PIO2_HI = 1.5707963267948966
_PIO2_LO = 6.123233995736766e-17
_TWO_OPI = 0.6366197723675814  # 2/pi

_SIN_C = (-1.0 / 6.0, 1.0 / 120.0, -1.0 / 5040.0, 1.0 / 362880.0,
          -1.0 / 39916800.0, 1.0 / 6227020800.0, -1.0 / 1307674368000.0)
_COS_C = (-1.0 / 2.0, 1.0 / 24.0, -1.0 / 720.0, 1.0 / 40320.0,
          -1.0 / 3628800.0, 1.0 / 479001600.0, -1.0 / 87178291200.0)


def _sin_kernel(r):
    r2 = r * r
    p = jnp.zeros_like(r)
    for c in reversed(_SIN_C):
        p = (p + c) * r2
    return r * (1.0 + p)


def _cos_kernel(r):
    r2 = r * r
    p = jnp.zeros_like(r)
    for c in reversed(_COS_C):
        p = (p + c) * r2
    return 1.0 + p


def _reduce(x):
    k = jnp.round(x * _TWO_OPI)
    r = (x - k * _PIO2_HI) - k * _PIO2_LO
    return r, jnp.asarray(k, jnp.int32) % 4


def accurate_sin(x):
    r, k = _reduce(x)
    s, c = _sin_kernel(r), _cos_kernel(r)
    return jnp.choose(k, [s, c, -s, -c], mode="clip")


def accurate_cos(x):
    r, k = _reduce(x)
    s, c = _sin_kernel(r), _cos_kernel(r)
    return jnp.choose(k, [c, -s, -c, s], mode="clip")


def accurate_atan2(y, x):
    """f64-accurate atan2: one Newton step on f(t) = sin(t)x - cos(t)y = 0
    squares the ~1e-8 error of XLA's approximate arctan2."""
    t = jnp.arctan2(y, x)
    s, c = accurate_sin(t), accurate_cos(t)
    return t - (s * x - c * y) / (c * x + s * y)


def _poly(theta2, coeffs):
    """Horner evaluation of sum_i coeffs[i] * theta2^i."""
    p = jnp.zeros_like(theta2) + coeffs[-1]
    for c in reversed(coeffs[:-1]):
        p = p * theta2 + c
    return p


def _taylor_pair(theta2, exact_fn, coeffs):
    """where(theta2 < _EPS2, Taylor(theta2), exact_fn(safe_theta)).

    coeffs are the Taylor coefficients in theta2 (enough terms that the
    truncation at theta2 = _EPS2 is below f64 eps). exact_fn receives
    theta = sqrt(theta2) guarded away from zero so its gradient is finite
    on the untaken branch.
    """
    small = theta2 < _EPS2
    theta = _safe_sqrt(theta2)
    return jnp.where(small, _poly(theta2, coeffs), exact_fn(theta))


def sinc(theta2):
    """sin(theta)/theta as a function of theta^2."""
    return _taylor_pair(
        theta2, lambda t: accurate_sin(t) / t,
        (1.0, -1.0 / 6.0, 1.0 / 120.0, -1.0 / 5040.0, 1.0 / 362880.0))


def cosc(theta2):
    """(1 - cos(theta))/theta^2 as a function of theta^2."""
    return _taylor_pair(
        theta2, lambda t: (1.0 - accurate_cos(t)) / (t * t),
        (0.5, -1.0 / 24.0, 1.0 / 720.0, -1.0 / 40320.0, 1.0 / 3628800.0))


def sincc(theta2):
    """(theta - sin(theta))/theta^3 as a function of theta^2."""
    return _taylor_pair(
        theta2, lambda t: (t - accurate_sin(t)) / (t * t * t),
        (1.0 / 6.0, -1.0 / 120.0, 1.0 / 5040.0, -1.0 / 362880.0,
         1.0 / 39916800.0))


def mm3(A, B):
    """(...,3,3) @ (...,3,3) without dot_general. XLA's transpose-into-dot
    folding miscompiles (RET_CHECK abort in hlo_computation.cc) batched
    small dots with 3+ batch dims — the shape the level-batched FK hits
    under nested vmap (scenario x line-search x stage) — so all 3x3 block
    algebra on the hot path is expressed elementwise; for 3x3 blocks the
    VPU path is at least as fast as a degenerate MXU dot anyway."""
    return jnp.sum(A[..., :, :, None] * B[..., None, :, :], axis=-2)


def mv3(R, v):
    """(...,3,3) @ (...,3) without dot_general (see mm3)."""
    return jnp.sum(R * v[..., None, :], axis=-1)


def mtv3(R, v):
    """R^T @ v for (...,3,3) x (...,3) without dot_general (see mm3)."""
    return jnp.sum(R * v[..., :, None], axis=-2)


def hat(w):
    """3-vector -> skew-symmetric matrix, hat(w) @ x == cross(w, x)."""
    zero = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zero, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], zero, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], zero], axis=-1),
        ],
        axis=-2,
    )


# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z)
# ---------------------------------------------------------------------------

def quat_identity(dtype=jnp.float64):
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_mul(q1, q2):
    w1, v1 = q1[..., 0], q1[..., 1:]
    w2, v2 = q2[..., 0], q2[..., 1:]
    w = w1 * w2 - jnp.sum(v1 * v2, axis=-1)
    v = (
        w1[..., None] * v2
        + w2[..., None] * v1
        + jnp.cross(v1, v2)
    )
    return jnp.concatenate([w[..., None], v], axis=-1)


def quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_rotate(q, x):
    """Rotate 3-vector x by unit quaternion q (i.e. R(q) @ x)."""
    v = q[..., 1:]
    w = q[..., 0:1]
    t = 2.0 * jnp.cross(v, x)
    return x + w * t + jnp.cross(v, t)


def quat_to_matrix(q):
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def quat_exp(w3):
    """Exp: so(3) -> unit quaternion. q = [cos(|w|/2), sinc(|w|/2) * w/2]."""
    theta2 = jnp.sum(w3 * w3, axis=-1)
    half2 = theta2 / 4.0
    c = _taylor_pair(  # cos(theta/2) as a function of (theta/2)^2
        half2, accurate_cos,
        (1.0, -0.5, 1.0 / 24.0, -1.0 / 720.0, 1.0 / 40320.0))
    s = sinc(half2)  # sin(theta/2)/(theta/2)
    return jnp.concatenate(
        [c[..., None], 0.5 * s[..., None] * w3], axis=-1
    )


def quat_log(q):
    """Log: unit quaternion -> so(3) 3-vector (angle * axis)."""
    w = q[..., 0]
    v = q[..., 1:]
    # Ensure the shortest path (q and -q are the same rotation).
    sgn = jnp.where(w < 0, -1.0, 1.0)
    w = w * sgn
    v = v * sgn[..., None]
    n2 = jnp.sum(v * v, axis=-1)
    n = _safe_sqrt(n2)
    theta = 2.0 * accurate_atan2(n, w)
    # scale = theta / n with n = sin(theta/2) for a unit quaternion. The
    # exact ratio is stable (no cancellation); the Taylor branch exists for
    # n -> 0 (division/gradient): with x = n/w, theta = 2 atan(x), so
    # scale = (2/w) * atan(x)/x = (2/w)(1 - x^2/3 + x^4/5 - x^6/7 + x^8/9).
    w_safe = jnp.maximum(w, 0.5)  # small branch only runs when w ~ 1
    t2 = n2 / (w_safe * w_safe)
    small_scale = (2.0 / w_safe) * _poly(
        t2, (1.0, -1.0 / 3.0, 1.0 / 5.0, -1.0 / 7.0, 1.0 / 9.0))
    scale = jnp.where(n2 < _EPS2, small_scale, theta / n)
    return scale[..., None] * v


def so3_exp(w3):
    return quat_to_matrix(quat_exp(w3))


# ---------------------------------------------------------------------------
# SE(3): pose = (quat, pos). Twist xi = [omega, v].
# ---------------------------------------------------------------------------

def se3_exp(xi):
    """Exp: se(3) -> (quat, pos). p = V(omega) @ v."""
    w, v = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    V = eye + cosc(theta2) * W + sincc(theta2) * mm3(W, W)
    p = mv3(V, v)
    return quat_exp(w), p


def se3_log(q, p):
    """Log: (quat, pos) -> se(3) twist [omega, v] with v = V(omega)^-1 p."""
    w = quat_log(q)
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=q.dtype), W.shape)
    # V^-1 = I - W/2 + coef * W^2,  coef = (1 - A/(2B)) / theta^2
    # with A = sinc(theta), B = cosc(theta). Taylor (Bernoulli series):
    # 1/12 + theta^2/720 + theta^4/30240 + theta^6/1209600 + ...
    A = sinc(theta2)
    B = cosc(theta2)
    small = theta2 < _EPS2
    coef = jnp.where(
        small,
        _poly(theta2, (1.0 / 12.0, 1.0 / 720.0, 1.0 / 30240.0,
                       1.0 / 1209600.0)),
        (1.0 - 0.5 * A / jnp.where(small, 1.0, B))
        / jnp.where(small, 1.0, theta2),
    )
    Vinv = eye - 0.5 * W + coef * mm3(W, W)
    v = mv3(Vinv, p)
    return jnp.concatenate([w, v], axis=-1)


def se3_compose(q1, p1, q2, p2):
    """X1 * X2 for poses (R(q), p)."""
    return quat_mul(q1, q2), p1 + quat_rotate(q1, p2)


def se3_inverse(q, p):
    qi = quat_conj(q)
    return qi, -quat_rotate(qi, p)


def _m4(theta2):
    """(1 - θ²/2 - cosθ)/θ⁴ as a function of θ². Exact branch written as
    (cosc - ½)/θ² so the f32 cancellation stays benign."""
    small = theta2 < _EPS2
    exact = (cosc(theta2) - 0.5) / jnp.where(small, 1.0, theta2)
    return jnp.where(
        small,
        _poly(theta2, (-1.0 / 24.0, 1.0 / 720.0, -1.0 / 40320.0,
                       1.0 / 3628800.0)),
        exact)


def _m5(theta2):
    """(θ - sinθ - θ³/6)/θ⁵ as a function of θ² (= (sincc - 1/6)/θ²)."""
    small = theta2 < _EPS2
    exact = (sincc(theta2) - 1.0 / 6.0) / jnp.where(small, 1.0, theta2)
    return jnp.where(
        small,
        _poly(theta2, (-1.0 / 120.0, 1.0 / 5040.0, -1.0 / 362880.0,
                       1.0 / 39916800.0)),
        exact)


def so3_jr(w):
    """SO(3) right Jacobian: Exp(w + d) ≈ Exp(w) Exp(Jr d)."""
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - cosc(theta2) * W + sincc(theta2) * mm3(W, W)


def se3_jr(xi):
    """SE(3) right Jacobian (angular-first twist [ω, v]):
    Exp6(ξ + d) ≈ Exp6(ξ) Exp6(Jr6 d), with block structure
    [[Jr3(ω), 0], [Q_r, Jr3(ω)]] and Q_r(ω, v) = Q_l(−ω, −v) (Barfoot's
    Q matrix; signs validated against forward-mode autodiff in
    tests/test_lie.py)."""
    phi, rho = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(phi * phi, axis=-1)[..., None, None]
    am, bm = hat(-phi), hat(-rho)
    c1 = sincc(theta2)
    m4 = _m4(theta2)
    m5 = _m5(theta2)
    ab = mm3(am, bm)
    ba = mm3(bm, am)
    aba = mm3(ab, am)
    aab = mm3(am, ab)
    baa = mm3(ba, am)
    Q = (0.5 * bm + c1 * (ab + ba + aba)
         - m4 * (aab + baa - 3.0 * aba)
         - 0.5 * (m4 - 3.0 * m5) * (mm3(aba, am) + mm3(aab, am)))
    Jr3 = so3_jr(phi)
    Z = jnp.zeros_like(Q)
    top = jnp.concatenate([Jr3, Z], axis=-1)
    bot = jnp.concatenate([Q, Jr3], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def ad6(quat, p):
    """6x6 adjoint of the pose (quat, p) on angular-first twists:
    Ad_X = [[R, 0], [hat(p) R, R]] with R = R(quat)."""
    R = quat_to_matrix(quat)
    hpR = mm3(hat(p), R)
    Z = jnp.zeros_like(R)
    top = jnp.concatenate([R, Z], axis=-1)
    bot = jnp.concatenate([hpR, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def se3_integrate(q, p, xi):
    """Local integration X' = X * Exp6(xi)."""
    qe, pe = se3_exp(xi)
    return se3_compose(q, p, qe, pe)


def se3_difference(q0, p0, q1, p1):
    """Log6(X0^-1 * X1): tangent taking X0 to X1 (local frame)."""
    qi, pi = se3_inverse(q0, p0)
    qd, pd = se3_compose(qi, pi, q1, p1)
    return se3_log(qd, pd)
