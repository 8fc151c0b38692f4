"""System-wide flux/current transformations (multi-species reductions).

Math ports on the ``(time, atoms, d)`` layout:

* ``IonicCurrent``                — ``ionic_current.py:40-60``
* ``TranslationalDipoleMoment``   — ``translational_dipole_moment.py:44-60``
* ``ThermalFlux``                 — ``thermal_flux.py:41-92``
* ``IntegratedHeatCurrent``       — ``integrated_heat_current.py:40-60``
* ``KinaciIntegratedHeatCurrent`` — ``kinaci_integrated_heat_current.py:41-90``
  (with per-species force-work integrals; see class note)
* ``MomentumFlux``                — ``momentum_flux.py:40-55``

Stress components use LAMMPS Voigt order ``[xx, yy, zz, xy, xz, yz]``.
"""

from __future__ import annotations


import jax.numpy as jnp
import numpy as np

from ..database.properties import mdsuite_properties as mp
from .base import Transformation


def _host_atom_sum(x: np.ndarray, w=None) -> np.ndarray:
    """Sum over the atom axis via BLAS batched matmul: (T, N, D) -> (T, D).

    The host-routed flux stages are O(bytes) reductions, so the reduce IS
    the stage cost. ``np.matmul`` streams ``x`` once at memory bandwidth
    (measured 15.6 GB/s on this VM's single core vs 0.5 GB/s for
    ``(x * w).sum(axis=1)`` and 1.6 GB/s for the jitted XLA reduce — the
    strided axis-1 reduction defeats numpy's pairwise loop, and the jit
    path additionally pays the host->jax buffer copy).

    ``w`` is an optional atom weight: a scalar (applied after the sum), a
    per-atom row (any shape reshapable to ``(N,)``), or a per-frame
    ``(T, N, 1)`` array (contracted by a batched gemv).
    """
    t, n, d = x.shape
    if w is not None:
        w = np.asarray(w, dtype=x.dtype)
        if w.size == 1:
            w_scalar = float(w.reshape(()))
            w = None
        elif w.ndim == 3 and w.shape[:2] == (t, n):
            # per-frame weights: (T, 1, N) @ (T, N, D) batched gemv
            return np.matmul(w.transpose(0, 2, 1), x)[:, 0, :]
        else:
            return np.matmul(w.reshape(1, 1, n), x)[:, 0, :]
    else:
        w_scalar = None
    out = np.matmul(np.ones((1, 1, n), x.dtype), x)[:, 0, :]
    return out if w_scalar is None else w_scalar * out


class IonicCurrent(Transformation):
    """J(t) = sum_species q_s * sum_atoms v_i(t)."""

    input_properties = [mp.velocities, mp.charge]
    output_property = mp.ionic_current
    scale_function = {"linear": {"scale_factor": 2}}
    multi_species = True

    def transform_batch(self, batch, carryover=None):
        out = None
        for props in batch.values():
            vel = props[mp.velocities.name]  # (T, N, 3)
            q = props[mp.charge.name]  # (T, N, 1) or (1, 1, 1) constant
            contrib = jnp.sum(vel * q, axis=1)  # (T, 3)
            out = contrib if out is None else out + contrib
        return out, None

    def transform_batch_host(self, batch, carryover=None):
        out = None
        for props in batch.values():
            contrib = _host_atom_sum(
                np.asarray(props[mp.velocities.name]), props[mp.charge.name]
            )
            out = contrib if out is None else out + contrib
        return out, None


class TranslationalDipoleMoment(Transformation):
    """M(t) = sum q_i r_i(t) over unwrapped positions."""

    input_properties = [mp.unwrapped_positions, mp.charge]
    output_property = mp.translational_dipole_moment
    scale_function = {"linear": {"scale_factor": 2}}
    multi_species = True

    def transform_batch(self, batch, carryover=None):
        out = None
        for props in batch.values():
            pos = props[mp.unwrapped_positions.name]
            q = props[mp.charge.name]
            contrib = jnp.sum(pos * q, axis=1)
            out = contrib if out is None else out + contrib
        return out, None

    def transform_batch_host(self, batch, carryover=None):
        out = None
        for props in batch.values():
            contrib = _host_atom_sum(
                np.asarray(props[mp.unwrapped_positions.name]),
                props[mp.charge.name],
            )
            out = contrib if out is None else out + contrib
        return out, None


class ThermalFlux(Transformation):
    """J(t) = sum (KE+PE) v  -  sum sigma . v (per-atom stress contraction)."""

    input_properties = [
        mp.stress,
        mp.velocities,
        mp.kinetic_energy,
        mp.potential_energy,
    ]
    output_property = mp.thermal_flux
    scale_function = {"linear": {"scale_factor": 20}}
    multi_species = True

    def transform_batch(self, batch, carryover=None):
        out = None
        for props in batch.values():
            stress = props[mp.stress.name]  # (T, N, 6)
            vel = props[mp.velocities.name]  # (T, N, 3)
            ke = props[mp.kinetic_energy.name]  # (T, N, 1)
            pe = props[mp.potential_energy.name]
            phi_x = (
                stress[..., 0] * vel[..., 0]
                + stress[..., 3] * vel[..., 1]
                + stress[..., 4] * vel[..., 2]
            )
            phi_y = (
                stress[..., 3] * vel[..., 0]
                + stress[..., 1] * vel[..., 1]
                + stress[..., 5] * vel[..., 2]
            )
            phi_z = (
                stress[..., 4] * vel[..., 0]
                + stress[..., 5] * vel[..., 1]
                + stress[..., 2] * vel[..., 2]
            )
            phi = jnp.stack([phi_x, phi_y, phi_z], axis=-1)  # (T, N, 3)
            energy_velocity = (ke + pe) * vel
            contrib = jnp.sum(energy_velocity - phi, axis=1)  # (T, 3)
            out = contrib if out is None else out + contrib
        return out, None

    def transform_batch_host(self, batch, carryover=None):
        out = None
        for props in batch.values():
            stress = np.asarray(props[mp.stress.name])  # (T, N, 6)
            vel = np.asarray(props[mp.velocities.name])  # (T, N, 3)
            ke = np.asarray(props[mp.kinetic_energy.name])
            pe = np.asarray(props[mp.potential_energy.name])
            # one batched GEMM gives every atom-summed stress-velocity
            # product sum_n s[t, n, c] v[t, n, d] at memory bandwidth;
            # the Voigt contraction then picks 3 + 3 + 3 scalars per frame
            m = np.matmul(stress.transpose(0, 2, 1), vel)  # (T, 6, 3)
            phi = np.stack(
                [
                    m[:, 0, 0] + m[:, 3, 1] + m[:, 4, 2],
                    m[:, 3, 0] + m[:, 1, 1] + m[:, 5, 2],
                    m[:, 4, 0] + m[:, 5, 1] + m[:, 2, 2],
                ],
                axis=-1,
            )  # (T, 3)
            contrib = _host_atom_sum(vel, ke + pe) - phi
            out = contrib if out is None else out + contrib
        return out, None


class IntegratedHeatCurrent(Transformation):
    """R(t) = sum (KE+PE) r over unwrapped positions."""

    input_properties = [
        mp.unwrapped_positions,
        mp.kinetic_energy,
        mp.potential_energy,
    ]
    output_property = mp.integrated_heat_current
    scale_function = {"linear": {"scale_factor": 5}}
    multi_species = True

    def transform_batch(self, batch, carryover=None):
        out = None
        for props in batch.values():
            pos = props[mp.unwrapped_positions.name]
            energy = props[mp.kinetic_energy.name] + props[mp.potential_energy.name]
            contrib = jnp.sum(energy * pos, axis=1)
            out = contrib if out is None else out + contrib
        return out, None

    def transform_batch_host(self, batch, carryover=None):
        out = None
        for props in batch.values():
            pos = np.asarray(props[mp.unwrapped_positions.name])
            energy = np.asarray(props[mp.kinetic_energy.name]) + np.asarray(
                props[mp.potential_energy.name]
            )  # (T, N, 1)
            contrib = _host_atom_sum(pos, energy)
            out = contrib if out is None else out + contrib
        return out, None


class KinaciIntegratedHeatCurrent(Transformation):
    """Kinaci integrated heat current with cross-batch force-work integrals.

    Per species: ``I_i(t) = integral dt' F_i . v_i`` accumulated with a
    cumulative sum and carried across batches; the current is
    ``sum_i r_i I_i + sum_i PE_i r_i``. NOTE: the reference accumulates the
    integrals of *all previously processed species* into each species' term
    (``kinaci_integrated_heat_current.py:61-86``, ``tf.add_n(integrals)``
    inside the species loop), which couples the result to species iteration
    order and — because ``add_n`` requires equal shapes — only even runs
    when every species has the same particle count. This implementation
    defaults to keeping each species' integral separate (the
    order-independent formulation); pass ``reference_accumulation=True``
    to reproduce the upstream coupled accumulation exactly (species in
    declaration order, total integral carried across batches).
    """

    input_properties = [
        mp.unwrapped_positions,
        mp.velocities,
        mp.forces,
        mp.potential_energy,
        mp.time_step,
        mp.sample_rate,
    ]
    output_property = mp.kinaci_heat_current
    scale_function = {"linear": {"scale_factor": 5}}
    multi_species = True
    requires_carryover = True

    #: carry key for the reference-mode total integral (all species)
    _TOTAL = "__reference_total__"

    def __init__(self, reference_accumulation: bool = False):
        self.reference_accumulation = bool(reference_accumulation)

    def _check_reference_shapes(self, batch):
        counts = {
            sp: props[mp.unwrapped_positions.name].shape[1]
            for sp, props in batch.items()
        }
        if len(set(counts.values())) > 1:
            raise ValueError(
                "reference_accumulation requires equal particle counts per "
                f"species (got {counts}): the reference's tf.add_n over "
                "per-species integrals only defines the coupled sum for "
                "equal shapes (kinaci_integrated_heat_current.py:82)."
            )

    def transform_batch(self, batch, carryover=None):
        from ..ops.geometry import time_cumsum

        if self.reference_accumulation:
            # upstream semantics: each species' r.I term contracts with the
            # RUNNING SUM of all previously processed species' integrals
            # (plus the carried total), and the carry is that total
            self._check_reference_shapes(batch)
            out = None
            running = None
            if carryover is not None and self._TOTAL in carryover:
                running = carryover[self._TOTAL][None]  # (1, N) -> bcast T
            for sp, props in batch.items():
                pos = props[mp.unwrapped_positions.name]  # (T, N, 3)
                vel = props[mp.velocities.name]
                force = props[mp.forces.name]
                pe = props[mp.potential_energy.name]  # (T, N, 1)
                dt = props[mp.time_step.name] * props[mp.sample_rate.name]
                integrand = jnp.sum(force * vel, axis=-1)  # (T, N)
                integral = time_cumsum(integrand, axis=0) * dt
                running = integral if running is None else running + integral
                r_k = jnp.sum(pos * running[..., None], axis=1)  # (T, 3)
                r_p = jnp.sum(pe * pos, axis=1)
                contrib = r_k + r_p
                out = contrib if out is None else out + contrib
            return out, {self._TOTAL: running[-1]}

        out = None
        new_carry = {}
        for sp, props in batch.items():
            pos = props[mp.unwrapped_positions.name]  # (T, N, 3)
            vel = props[mp.velocities.name]
            force = props[mp.forces.name]
            pe = props[mp.potential_energy.name]  # (T, N, 1)
            dt = props[mp.time_step.name] * props[mp.sample_rate.name]

            integrand = jnp.sum(force * vel, axis=-1)  # (T, N)
            integral = time_cumsum(integrand, axis=0) * dt
            if carryover is not None and sp in carryover:
                integral = integral + carryover[sp][None]
            new_carry[sp] = integral[-1]

            r_k = jnp.sum(pos * integral[..., None], axis=1)  # (T, 3)
            r_p = jnp.sum(pe * pos, axis=1)
            contrib = r_k + r_p
            out = contrib if out is None else out + contrib
        return out, new_carry

    def bootstrap_carry_multi(self, experiment, species, offset: int):
        """Exact append-resume: re-integrate each species' per-atom
        force-work integral over the already-processed frames.

        The stored output is the species-summed current — the per-atom
        integrals the carry needs are not recoverable from it, so resume
        streams Velocities/Forces for frames ``[0, offset)`` once (same
        math as :meth:`transform_batch`'s cumsum tail, accumulated in
        f64)."""
        from ..database.trajectory_store import join_path

        dt = float(np.asarray(experiment.time_step)) * float(
            np.asarray(experiment.sample_rate)
        )
        carry = {}
        for sp in species:
            n = experiment.species[sp].n_particles
            # ~256 MB of (vel + force) f32 rows per slab
            step = max(1, (1 << 28) // max(1, 2 * n * 3 * 4))
            total = np.zeros((n,), dtype=np.float64)
            v_path = join_path(sp, mp.velocities.name)
            f_path = join_path(sp, mp.forces.name)
            for a in range(0, offset, step):
                frames = slice(a, min(offset, a + step))
                vel = experiment.store.load([v_path], frames=frames)[v_path]
                force = experiment.store.load([f_path], frames=frames)[f_path]
                total += np.einsum(
                    "tnd,tnd->n", force, vel, dtype=np.float64
                )
            carry[sp] = total * dt
        if self.reference_accumulation:
            # upstream carries ONE total integral summed over species
            vals = list(carry.values())
            if len({v.shape for v in vals}) > 1:
                raise ValueError(
                    "reference_accumulation resume requires equal particle "
                    "counts per species (see transform_batch)."
                )
            return {self._TOTAL: np.sum(vals, axis=0)}
        return carry

    def transform_batch_host(self, batch, carryover=None):
        if self.reference_accumulation:
            self._check_reference_shapes(batch)
            out = None
            running = None
            if carryover is not None and self._TOTAL in carryover:
                running = np.asarray(carryover[self._TOTAL])[None]
            for sp, props in batch.items():
                pos = np.asarray(props[mp.unwrapped_positions.name])
                vel = np.asarray(props[mp.velocities.name])
                force = np.asarray(props[mp.forces.name])
                pe = np.asarray(props[mp.potential_energy.name])
                dt = float(
                    np.asarray(props[mp.time_step.name])
                    * np.asarray(props[mp.sample_rate.name])
                )
                integrand = np.einsum("tnd,tnd->tn", force, vel)
                integral = np.cumsum(integrand, axis=0) * dt
                running = (
                    integral if running is None else running + integral
                )
                r_k = np.matmul(running[:, None, :], pos)[:, 0, :]
                contrib = r_k + _host_atom_sum(pos, pe)
                out = contrib if out is None else out + contrib
            return out, {self._TOTAL: running[-1]}
        out = None
        new_carry = {}
        for sp, props in batch.items():
            pos = np.asarray(props[mp.unwrapped_positions.name])  # (T, N, 3)
            vel = np.asarray(props[mp.velocities.name])
            force = np.asarray(props[mp.forces.name])
            pe = np.asarray(props[mp.potential_energy.name])  # (T, N, 1)
            dt = float(
                np.asarray(props[mp.time_step.name])
                * np.asarray(props[mp.sample_rate.name])
            )
            integrand = np.einsum("tnd,tnd->tn", force, vel)  # (T, N)
            integral = np.cumsum(integrand, axis=0) * dt
            if carryover is not None and sp in carryover:
                integral = integral + np.asarray(carryover[sp])[None]
            new_carry[sp] = integral[-1]
            # batched gemv: r_k[t, d] = sum_n integral[t, n] pos[t, n, d]
            r_k = np.matmul(integral[:, None, :], pos)[:, 0, :]
            contrib = r_k + _host_atom_sum(pos, pe)
            out = contrib if out is None else out + contrib
        return out, new_carry


class MomentumFlux(Transformation):
    """Off-diagonal stress sums for viscosity: (sum sxy, sum sxz, sum syz)."""

    input_properties = [mp.stress]
    output_property = mp.momentum_flux
    scale_function = {"linear": {"scale_factor": 5}}
    multi_species = True

    def transform_batch(self, batch, carryover=None):
        out = None
        for props in batch.values():
            stress = props[mp.stress.name]  # (T, N, 6)
            contrib = jnp.stack(
                [
                    jnp.sum(stress[..., 3], axis=1),
                    jnp.sum(stress[..., 4], axis=1),
                    jnp.sum(stress[..., 5], axis=1),
                ],
                axis=-1,
            )
            out = contrib if out is None else out + contrib
        return out, None

    def transform_batch_host(self, batch, carryover=None):
        out = None
        for props in batch.values():
            stress = np.asarray(props[mp.stress.name])  # (T, N, 6)
            sums = _host_atom_sum(stress)  # (T, 6), one streaming pass
            contrib = sums[:, 3:6]
            out = contrib if out is None else out + contrib
        return out, None
