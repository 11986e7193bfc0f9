"""On-manifold IMU preintegration (Forster RSS'15) as a fixed-shape scan.

Counterpart of ``src/processing/IMUPreintegrator.{h,cpp}``: delta
rotation/velocity/position between two camera times, first-order bias
Jacobians, 15x15 covariance, and bias re-linearization without
re-integration (IMUPreintegrator.cpp:143-308).

Deliberate corrections vs the reference (validated by finite-difference
tests, SURVEY.md §4):

- the reference OVERWRITES J_Rg each step (``preint->J_Rg = -dR^T Jr
  dt``, IMUPreintegrator.cpp:222) instead of accumulating the Forster
  recursion, and uses a positive-sign J_Va; we implement the standard
  recursions (J_Rg <- dR^T J_Rg - Jr dt, J_Va <- J_Va - R dt, ...),
  which match numeric re-integration under bias perturbation;
- the reference's covariance propagation drops the rotation noise
  coupling entirely (A has no rotation->vel/pos blocks and B maps no
  gyro noise into the rotation block, IMUPreintegrator.cpp:240-274:
  rotation uncertainty never grows); we use the full Forster A/B.

Samples are ``[S, 7]`` rows (t, ax, ay, az, gx, gy, gz) with a validity
mask so the scan is fixed-shape under jit; per-sample dt is clamped to
[0.5 ms, 20 ms] exactly like IMUPreintegrator.cpp:183-184.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..geometry import lie
from ..utils.precision import jit as _pjit


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Preintegration:
    delta_r: jax.Array  # [3,3]
    delta_v: jax.Array  # [3]
    delta_p: jax.Array  # [3]
    j_rg: jax.Array  # [3,3] d(delta_r)/d(gyro bias)
    j_vg: jax.Array  # [3,3]
    j_va: jax.Array  # [3,3]
    j_pg: jax.Array  # [3,3]
    j_pa: jax.Array  # [3,3]
    cov: jax.Array  # [15,15] (theta, v, p, bg, ba)
    bg: jax.Array  # [3] bias used during integration
    ba: jax.Array  # [3]
    dt_total: jax.Array  # []
    n_samples: jax.Array  # [] i32


def identity_preintegration() -> Preintegration:
    z33 = jnp.zeros((3, 3))
    return Preintegration(
        delta_r=jnp.eye(3),
        delta_v=jnp.zeros(3),
        delta_p=jnp.zeros(3),
        j_rg=z33,
        j_vg=z33,
        j_va=z33,
        j_pg=z33,
        j_pa=z33,
        cov=jnp.zeros((15, 15)),
        bg=jnp.zeros(3),
        ba=jnp.zeros(3),
        dt_total=jnp.asarray(0.0, jnp.float32),
        n_samples=jnp.asarray(0, jnp.int32),
    )


@functools.partial(_pjit, static_argnames=())
def preintegrate(
    samples: jax.Array,  # [S, 7] rows (t, ax, ay, az, gx, gy, gz)
    mask: jax.Array,  # [S] bool
    bg: jax.Array,  # [3]
    ba: jax.Array,  # [3]
    gyro_noise: jax.Array | float = 0.001,
    accel_noise: jax.Array | float = 0.01,
    gyro_bias_noise: jax.Array | float = 1e-4,
    accel_bias_noise: jax.Array | float = 1e-3,
    min_dt: float = 0.0005,
    max_dt: float = 0.02,
    default_dt: float = 0.002,
) -> Preintegration:
    """Integrate all masked samples; fixed-shape lax.scan."""
    s = samples.shape[0]
    t = samples[:, 0]
    # dt[i] = t[i] - t[i-1]; first sample uses t[1]-t[0] (avg-rate rule,
    # IMUPreintegrator.cpp:175-180) or default when only one sample.
    dt_next = jnp.diff(t, append=t[-1:])
    dt_prev = jnp.diff(t, prepend=t[:1])
    first_dt = jnp.where(jnp.sum(mask) > 1, dt_next[0], default_dt)
    dts = dt_prev.at[0].set(first_dt)
    dts = jnp.clip(dts, min_dt, max_dt)
    dts = jnp.where(mask, dts, 0.0)

    sg2 = gyro_noise * gyro_noise
    sa2 = accel_noise * accel_noise
    sbg2 = gyro_bias_noise * gyro_bias_noise
    sba2 = accel_bias_noise * accel_bias_noise

    def step(carry: Preintegration, inp):
        row, dt, m = inp
        acc = row[1:4] - ba
        gyr = row[4:7] - bg

        r = carry.delta_r
        omega_dt = gyr * dt
        dr = lie.so3_exp(omega_dt)
        jr = lie.so3_right_jacobian(omega_dt)
        a_hat = lie.hat(acc)

        # Forster bias-Jacobian recursions (old values on RHS)
        j_pg = carry.j_pg + carry.j_vg * dt - 0.5 * (r @ a_hat @ carry.j_rg) * dt * dt
        j_pa = carry.j_pa + carry.j_va * dt - 0.5 * r * dt * dt
        j_vg = carry.j_vg - (r @ a_hat @ carry.j_rg) * dt
        j_va = carry.j_va - r * dt
        j_rg = dr.T @ carry.j_rg - jr * dt

        # State integration (IMUPreintegrator.cpp:196-236 order)
        delta_p = carry.delta_p + carry.delta_v * dt + 0.5 * (r @ acc) * dt * dt
        delta_v = carry.delta_v + (r @ acc) * dt
        delta_r = r @ dr

        # Covariance: full Forster A/B on the 9x9 (theta, v, p) block
        a_mat = jnp.eye(9)
        a_mat = a_mat.at[0:3, 0:3].set(dr.T)
        a_mat = a_mat.at[3:6, 0:3].set(-(r @ a_hat) * dt)
        a_mat = a_mat.at[6:9, 0:3].set(-0.5 * (r @ a_hat) * dt * dt)
        a_mat = a_mat.at[6:9, 3:6].set(jnp.eye(3) * dt)
        b_mat = jnp.zeros((9, 6))
        b_mat = b_mat.at[0:3, 0:3].set(jr * dt)
        b_mat = b_mat.at[3:6, 3:6].set(r * dt)
        b_mat = b_mat.at[6:9, 3:6].set(0.5 * r * dt * dt)
        nga = jnp.diag(jnp.concatenate([jnp.full(3, sg2), jnp.full(3, sa2)]))
        cov9 = a_mat @ carry.cov[:9, :9] @ a_mat.T + b_mat @ nga @ b_mat.T
        cov = carry.cov.at[:9, :9].set(cov9)
        # bias random walk (IMUPreintegrator.cpp:247-250)
        walk = jnp.concatenate([jnp.full(3, sbg2 * dt), jnp.full(3, sba2 * dt)])
        cov = cov.at[9:15, 9:15].add(jnp.diag(walk))

        new = Preintegration(
            delta_r=delta_r, delta_v=delta_v, delta_p=delta_p,
            j_rg=j_rg, j_vg=j_vg, j_va=j_va, j_pg=j_pg, j_pa=j_pa,
            cov=cov, bg=carry.bg, ba=carry.ba,
            dt_total=carry.dt_total + dt,
            n_samples=carry.n_samples + 1,
        )
        out = jax.tree_util.tree_map(lambda n, o: jnp.where(m, n, o), new, carry)
        return out, None

    init = dataclasses.replace(identity_preintegration(), bg=bg, ba=ba)
    final, _ = jax.lax.scan(step, init, (samples, dts, mask))
    return final


@_pjit
def update_bias(preint: Preintegration, new_bg: jax.Array, new_ba: jax.Array) -> Preintegration:
    """First-order re-linearization at a new bias without re-integration
    (IMUPreintegrator.cpp:276-308, with the corrected Jacobian signs)."""
    dbg = new_bg - preint.bg
    dba = new_ba - preint.ba
    return dataclasses.replace(
        preint,
        delta_r=preint.delta_r @ lie.so3_exp(preint.j_rg @ dbg),
        delta_v=preint.delta_v + preint.j_vg @ dbg + preint.j_va @ dba,
        delta_p=preint.delta_p + preint.j_pg @ dbg + preint.j_pa @ dba,
        bg=new_bg,
        ba=new_ba,
    )


def predict_state(
    r_i: jax.Array, t_i: jax.Array, v_i: jax.Array,
    preint: Preintegration,
    gravity_w: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Propagate (R, p, v) through a preintegrated interval
    (Estimator.cpp:429-471):
      R_j = R_i dR;  v_j = v_i + g dt + R_i dV;
      p_j = p_i + v_i dt + 1/2 g dt^2 + R_i dP.
    """
    dt = preint.dt_total
    r_j = r_i @ preint.delta_r
    v_j = v_i + gravity_w * dt + r_i @ preint.delta_v
    p_j = t_i + v_i * dt + 0.5 * gravity_w * dt * dt + r_i @ preint.delta_p
    return r_j, p_j, v_j


def estimate_static_bias(
    samples: jax.Array,  # [S,7]
    mask: jax.Array,
    gravity_magnitude: float = 9.81,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Stationary bias estimate (IMUPreintegrator.cpp:78-124): gyro bias
    = mean gyro; accel bias = mean accel minus the gravity reaction
    along its own direction. Returns (bg, ba, gravity_dir_body)."""
    wsum = jnp.maximum(jnp.sum(mask), 1)
    mean = jnp.sum(jnp.where(mask[:, None], samples[:, 1:7], 0.0), axis=0) / wsum
    mean_acc, mean_gyr = mean[:3], mean[3:]
    g_dir = mean_acc / jnp.maximum(jnp.linalg.norm(mean_acc), 1e-9)
    ba = mean_acc - g_dir * gravity_magnitude
    return mean_gyr, ba, g_dir
