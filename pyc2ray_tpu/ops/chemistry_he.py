"""Coupled hydrogen + helium ionization chemistry — the He extension.

Helium chemistry is declared TODO in the reference (README.md:81-87).
This module extends the C2Ray chemistry pattern (ops/chemistry.py /
chemistry.f90: analytic per-cell solution with constant rates, iterated
on the time-averaged electron density) to the three-species system

    x   = n_HII / n_H                  (doric closed form, reused)
    y1  = n_HeII / n_He,  y2 = n_HeIII / n_He

With rates frozen per iteration, the helium pair obeys the LINEAR system

    d/dt (y1, y2) = A (y1, y2)^T + b,
    A = [[-(G1 + G2 + R2),  -G1 + R3],
         [ G2,              -R3     ]],      b = (G1, 0)
    G1 = Gamma_HeI + ne C_HeI(T),  G2 = Gamma_HeII + ne C_HeII(T),
    R2 = ne alpha_HeII(T),         R3 = ne alpha_HeIII(T)

solved EXACTLY over the timestep with the 2x2 matrix exponential in
eigen form (real eigenvalues: the system is a compartmental birth-death
chain), including the exact time average

    <u> = u_eq + [phi(l1 dt) P1 + phi(l2 dt) P2] (u0 - u_eq),
    phi(z) = (e^z - 1)/z

— the direct generalization of doric's scalar (x0-xeq)e^{-dt}+xeq and
its avg_factor (chemistry.f90:285-306). The outer iteration updates
ne = n_H(x + abu_c) + n_He(y1 + 2 y2) and re-solves both species until
the time-averaged fractions converge, mirroring global_pass exactly.

Rate coefficients: helium recombination uses the hydrogenic case-B
scaling alpha_HeIII(T) = 2 alpha_B(T/4) from the configured hydrogen
coefficients (bh00, albpow), alpha_HeII a separate power law (default
2.72e-13 (T/1e4)^-0.789); collisional ionization uses the Cen (1992)
sqrt(T) exp(-E/kT) forms.

Secondary ionizations (opt-in, ``global_pass_he(..., heat=...)``): fast
photoelectrons deposit a fraction of their energy in collisional
ionization of HI and HeI instead of heat, with the Shull & van
Steenberg (1985) fractions evaluated at the (iterated) time-averaged
hydrogen ionized fraction. The raytracer's heat channel already carries
the FULL per-HI-atom photoelectron energy deposition rate of all three
species (raytrace_he.py heat channel contract), so the per-HI-atom
secondary rate is simply f_ion,H(x) * heat / E_th,HI — density-free —
and the HeI rate rescales by the HI/HeI number-density ratio. The
consumer of the heat channel must then multiply it by f_heat(x)
(``secondary_heating_fraction``) so energy is not double-counted.
On-the-spot recycling of He recombination radiation (opt-in,
``recombination_photons=True``): case-B HeII/HeIII recombination
photons redistributed into HI/HeI ionizations with local
absorption-competition fractions (see global_pass_he docstring).

Two documented scope limits of the secondary-ionization channel:
(1) when the 1e12/s cap on the per-HeI-atom rate engages (only in the
unphysical regime where rate*dt has long since saturated full
ionization), the clipped energy is dropped rather than redirected to
heat — energy is not conserved under the cap; (2) the SvS fractions
are asymptotic (valid for photoelectrons above ~100 eV) and are applied
band-wide, so soft SEDs (low-Teff blackbodies whose photoelectrons
carry only a few eV) overestimate secondary ionization. Limit (2) has
an opt-in correction: ``Photo.secondary_ramp`` multiplies the SvS
fractions by SED-averaged threshold ramps r_i(E) = max(0, 1 - E_th,i/E)
(radiation.helium.secondary_ramps; exactly zero below threshold, -> 1
asymptotically where SvS was calibrated — the energy-conservation
interpolation whose fitted refinement is Ricotti, Gnedin & Shull 2002).
The suppressed ionization energy is NOT re-added to the thermal
channel (bounded by f_ion <= 0.39 of the deposition); off by default,
preserving the plain band-wide SvS behavior.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..constants import EPSILON, hplanck, ev2fr
from ..radiation.helium import HE_EDGES_EV
from .chemistry import (ChemistryParams, doric, MIN_FRACTIONAL_CHANGE,
                        MIN_FRACTION_OF_ATOMS, MAX_INNER_ITER)

__all__ = ["HeChemistryParams", "he_update", "global_pass_he",
           "secondary_ionization_fractions",
           "secondary_heating_fraction", "secondary_enabled",
           "thermal_heat_rate"]

# ionization thresholds in erg (E = h nu_th)
_ETH_ERG = tuple(hplanck * ev2fr * e for e in HE_EDGES_EV)


def secondary_ionization_fractions(x):
    """Shull & van Steenberg (1985) energy fractions of a fast
    photoelectron going into collisional ionization of HI and HeI, as a
    function of the hydrogen ionized fraction x. Returns (f_HI, f_HeI).

    Fits (their eqs. for phi_ion): f = C (1 - x^a)^b with
    (C, a, b) = (0.3908, 0.4092, 1.7592) for HI and
    (0.0554, 0.4614, 1.6660) for HeI. Valid asymptotically for
    >~ 100 eV electrons; applied band-wide here (the soft-UV
    photoelectrons carry little energy, so the error is bounded by
    their small share of the deposition)."""
    xc = jnp.clip(x, 0.0, 1.0)
    f_hi = 0.3908 * (1.0 - xc ** 0.4092) ** 1.7592
    f_hei = 0.0554 * (1.0 - xc ** 0.4614) ** 1.6660
    return f_hi, f_hei


def secondary_heating_fraction(x):
    """Shull & van Steenberg (1985) heat fraction 0.9971
    (1 - (1 - x^0.2663)^1.3163): ~0.11 at x=1e-4, ->1 fully ionized.
    Multiply the raytracer's heat channel by this when secondary
    ionizations are on (energy split, not double count)."""
    xc = jnp.clip(x, 0.0, 1.0)
    return 0.9971 * (1.0 - (1.0 - xc ** 0.2663) ** 1.3163)


def secondary_enabled(phe, do_heating):
    """One shared gate for every evolve path: True iff secondary
    ionizations are configured; raises if they are configured without
    the heat channel that carries the energy being redistributed."""
    sec = bool(getattr(phe, "secondary", False))
    if sec and not do_heating:
        raise ValueError(
            "secondary ionizations require HeRaytracer(do_heating=True) "
            "(Photo.compute_heating_rates: the heat channel carries the "
            "photoelectron energy being redistributed)")
    return sec


def thermal_heat_rate(phe, heat, xh_av, secondary):
    """The heat rate the THERMAL solver should consume: the raytracer's
    channel, scaled by f_heat(x) when the chemistry consumed f_ion of
    the same deposition (energy split, not double count). One shared
    implementation so the single-device / source-parallel / domain
    paths cannot diverge."""
    if not secondary:
        return heat
    return heat * secondary_heating_fraction(xh_av)


class HeChemistryParams(NamedTuple):
    chem: ChemistryParams          # hydrogen coefficients (doric)
    abu_he: float                  # n_He / n_H
    bhe00: float = 2.72e-13        # alpha_HeII at 1e4 K
    alhepow: float = -0.789        # its T power law
    colhe0: float = 2.38e-11       # C_HeI prefactor (Cen 1992)
    temphe0: float = 285335.4      # HeI ionization energy / k_B
    colhe1: float = 5.68e-12       # C_HeII prefactor (Cen 1992)
    temphe1: float = 631515.0      # HeII ionization energy / k_B
    # secondary ionizations by fast photoelectrons (Shull & van
    # Steenberg 1985). Host-level flag: the evolve loops read it to
    # decide whether to pass the heat channel into global_pass_he and
    # to scale thermal input by secondary_heating_fraction; it is never
    # branched on inside traced code.
    secondary: bool = False
    # on-the-spot recycling of He recombination photons (see
    # global_pass_he docstring). Host-level flag like ``secondary``:
    # callers forward it as the STATIC recombination_photons kwarg.
    recombination_photons: bool = False
    # absorption cross sections entering the on-the-spot redistribution
    # fractions: (sigma_HI, sigma_HeI) evaluated at the HeI edge
    # (24.59 eV — where the HeII->HeI recombination continuum sits) and
    # at 40.8 eV (HeII Ly-alpha, the dominant HeIII->HeII channel).
    # Defaults from the reference power-law family (sigma0 (nu/nu0)^-s);
    # models/base recomputes them from the configured cross-section
    # model so the recycling stays consistent with the raytracer bins.
    sig_h_he1: float = 1.2e-18     # sigma_HI(24.59 eV)
    sig_he1_he1: float = 7.43e-18  # sigma_HeI(24.59 eV)
    sig_h_lya2: float = 2.9e-19    # sigma_HI(40.8 eV)
    sig_he1_lya2: float = 2.95e-18  # sigma_HeI(40.8 eV)
    # energy-dependent secondary-ionization ramps (opt-in,
    # Photo.secondary_ramp): SED-averaged factors in [0, 1] multiplying
    # the SvS f_ion fractions, from radiation.helium.secondary_ramps —
    # the threshold interpolation r_i(E) = max(0, 1 - E_th,i/E)
    # addressing scope limit #2 above (soft SEDs overestimate secondary
    # ionization when the asymptotic fits are applied band-wide).
    # Default 1.0 = the plain band-wide SvS behavior.
    sec_ramp_hi: float = 1.0
    sec_ramp_hei: float = 1.0


def _expm2(A11, A12, A21, A22, b1, b2, u1, u2, dt):
    """Exact solution + time average of du/dt = A u + b over dt for a
    batch of 2x2 systems with real eigenvalues (clamped discriminant).

    Formulated WITHOUT inverting A (the equilibrium -A^-1 b does not
    exist when A is singular — e.g. zero electron density makes R3=0 —
    and a near-zero determinant underflows on TPU):

        u(t)  = exp(At) u0 + t phi1(At) b
        <u>   = phi1(At) u0 + t phi2(At) b

    with the ENTIRE functions phi1(z) = (e^z-1)/z, phi2(z) =
    (e^z-1-z)/z^2. Each matrix function f(At) is evaluated in
    divided-difference form f(l2 t) I + [f(l1 t)-f(l2 t)]/(l1-l2)
    (At - l2 t I); eigenvalue confluence is regularized by flooring the
    discriminant at a sqrt(eps)-scale separation (relative error of
    that nudge is ~sqrt(eps), far below the solver's physical accuracy).

    Returns (u1(dt), u2(dt), <u1>, <u2>)."""
    dtype = jnp.result_type(A11, u1)
    eps = jnp.finfo(dtype).eps
    tr = A11 + A22
    det = A11 * A22 - A12 * A21
    disc = jnp.sqrt(jnp.maximum(tr * tr - 4.0 * det, 0.0))
    # floor the separation so divided differences stay well-conditioned
    scale = jnp.abs(tr) + jnp.abs(A12) + jnp.abs(A21) + jnp.asarray(
        1e-30 if dtype == jnp.float32 else 1e-290, dtype)
    disc = jnp.maximum(disc, jnp.sqrt(eps) * scale)
    # the compartmental system is dissipative: eigenvalues <= 0. The
    # discriminant floor can push l1 marginally positive; clamp so a huge
    # dt can never produce exp(+large).
    l1 = jnp.minimum(0.5 * (tr + disc), 0.0)
    l2 = 0.5 * (tr - disc)

    def phi1(z):
        small = jnp.abs(z) < 1e-6
        zs = jnp.where(small, 1.0, z)
        return jnp.where(small, 1.0 + 0.5 * z + z * z / 6.0,
                         jnp.expm1(zs) / zs)

    def phi2(z):
        small = jnp.abs(z) < 1e-4
        zs = jnp.where(small, 1.0, z)
        return jnp.where(small, 0.5 + z / 6.0 + z * z / 24.0,
                         (jnp.expm1(zs) - zs) / (zs * zs))

    z1 = l1 * dt
    z2 = l2 * dt
    inv_sep = 1.0 / ((l1 - l2) * dt)

    def apply_f(f1v, f2v, v1, v2):
        """f(At) v via f(z2) I + [f(z1)-f(z2)]/(z1-z2) (At - z2 I)."""
        dd = (f1v - f2v) * inv_sep
        w1 = (A11 * dt - z2) * v1 + A12 * dt * v2
        w2 = A21 * dt * v1 + (A22 * dt - z2) * v2
        return f2v * v1 + dd * w1, f2v * v2 + dd * w2

    e1v, e2v = jnp.exp(z1), jnp.exp(z2)
    p1v, p2v = phi1(z1), phi1(z2)
    q1v, q2v = phi2(z1), phi2(z2)

    eu1, eu2 = apply_f(e1v, e2v, u1, u2)
    pb1, pb2 = apply_f(p1v, p2v, b1, b2)
    ut1 = eu1 + dt * pb1
    ut2 = eu2 + dt * pb2

    pu1, pu2 = apply_f(p1v, p2v, u1, u2)
    qb1, qb2 = apply_f(q1v, q2v, b1, b2)
    ua1 = pu1 + dt * qb1
    ua2 = pu2 + dt * qb2
    return ut1, ut2, ua1, ua2


def _clamp_pair(y1, y2, dtype):
    eps = jnp.asarray(EPSILON, dtype)
    y1 = jnp.clip(y1, eps, 1.0)
    y2 = jnp.clip(y2, 0.0, 1.0)
    tot = y1 + y2
    scale = jnp.where(tot > 1.0, (1.0 - eps) / jnp.where(tot > 1.0, tot, 1.0),
                      1.0)
    return y1 * scale, y2 * scale


def he_update(y1, y2, dt, temp, ne, g_he1, g_he2, p: HeChemistryParams):
    """One frozen-rate helium update: returns (y1_t, y2_t, y1_av, y2_av)."""
    dtype = jnp.result_type(y1, temp)
    sq = jnp.sqrt(temp)
    damp = 1.0 / (1.0 + jnp.sqrt(temp / 1.0e5))       # Cen 1992 damping
    c1 = p.colhe0 * sq * jnp.exp(-p.temphe0 / temp) * damp
    c2 = p.colhe1 * sq * jnp.exp(-p.temphe1 / temp) * damp
    a2 = p.bhe00 * (temp / 1.0e4) ** p.alhepow
    # hydrogenic scaling for HeIII -> HeII case-B recombination
    a3 = 2.0 * p.chem.bh00 * (temp / 4.0e4) ** p.chem.albpow
    a3 = a3 * p.chem.clumping
    a2 = a2 * p.chem.clumping

    G1 = g_he1 + ne * c1
    G2 = g_he2 + ne * c2
    R2 = ne * a2
    R3 = ne * a3

    A11 = -(G1 + G2 + R2)
    A12 = -G1 + R3
    A21 = G2
    A22 = -R3
    y1t, y2t, y1a, y2a = _expm2(A11, A12, A21, A22, G1,
                                jnp.zeros_like(G1), y1, y2, dt)
    y1t, y2t = _clamp_pair(y1t, y2t, dtype)
    y1a, y2a = _clamp_pair(y1a, y2a, dtype)
    return y1t, y2t, y1a, y2a


@partial(jax.jit, static_argnames=("recombination_photons",))
def global_pass_he(dt, ndens, temp, xh, xh_av, y1, y1_av, y2, y2_av,
                   phi_h, phi_he1, phi_he2, p: HeChemistryParams,
                   mask=None, heat=None, recombination_photons=False):
    """Coupled H+He chemistry pass (elementwise over any shape).

    ndens is the HYDROGEN number density; n_He = abu_he * ndens.
    ``mask`` (optional bool array) excludes cells from the
    non-convergence count (dead padding rows, parallel/domain.py).
    ``heat`` (optional): the raytracer's per-HI-atom photoelectron
    energy deposition rate (erg/s) — passing it turns ON secondary
    ionizations (Shull & van Steenberg 1985 fractions at the iterated
    time-averaged x; see module docstring). The caller must then scale
    its own thermal use of the channel by secondary_heating_fraction.

    ``recombination_photons`` (static): on-the-spot recycling of the
    He recombination radiation. Per iteration, at the current iterated
    state, the volumetric case-B recombination photon rates
    rec2 = ne alpha_HeII n_HeII (continuum at the 24.59 eV HeI edge)
    and rec3 = ne alpha_HeIII n_HeIII (dominantly HeII Ly-alpha at
    40.8 eV) are redistributed between HI and HeI ionizations with the
    local absorption-competition fractions
        y = n_HI sig_HI / (n_HI sig_HI + n_HeI sig_HeI)
    evaluated at each channel's energy (Osterbrock; the role of the
    y/z factors of Friedrich et al. 2012's C2Ray-He). Every recycled
    photon ionizes exactly one atom (y + (1-y) = 1 — photon
    conserving); where BOTH absorbers vanish the cell is transparent
    and the on-the-spot photons are dropped (the standard OTS scope
    limit). Photoheating by the small excess energy of recycled
    photons is not modeled. Exactly reduces to the plain pass when
    off (default).

    Returns (xh_t, xh_av, y1_t, y1_av, y2_t, y2_av, conv_flag)."""
    chem = p.chem
    nhe = p.abu_he * ndens
    xh_av_entry = xh_av
    dtype = jnp.result_type(xh, temp)
    tiny = jnp.asarray(1e-30 if dtype == jnp.float32 else 1e-280, dtype)
    if heat is not None:
        # volumetric deposition / n_HeI, precomputed outside the loop:
        # E_dep = heat * n_HI; per-HeI-atom = f_HeI E_dep / (Eth n_HeI).
        # Zero where there is no HeI (abu_he=0 or fully ionized He), and
        # cap the per-atom rate at 1e12/s — rate*dt is saturated (fully
        # ionized within any physical timestep) long before that, while
        # an uncapped ratio overflows tr^2 in the 2x2 eigensolve.
        nhi = ndens * (1.0 - xh_av_entry)
        nhei = nhe * (1.0 - y1_av - y2_av)
        dep_over_nhei = jnp.where(
            nhei > tiny, heat * nhi / jnp.maximum(nhei, tiny), 0.0)
        dep_over_nhei = jnp.minimum(dep_over_nhei,
                                    1e12 * _ETH_ERG[1])

    def cond(state):
        active, nit = state[-2], state[-1]
        return jnp.logical_and(nit < MAX_INNER_ITER, jnp.any(active))

    def body(state):
        (xav, xint, y1av, y1int, y2av, y2int, active, nit) = state
        ne = ndens * (xav + chem.abu_c) + nhe * (y1av + 2.0 * y2av)
        ph, phe1 = phi_h, phi_he1
        if heat is not None:
            f_hi, f_hei = secondary_ionization_fractions(xav)
            ph = phi_h + p.sec_ramp_hi * f_hi * heat / _ETH_ERG[0]
            phe1 = phi_he1 + p.sec_ramp_hei * f_hei \
                * dep_over_nhei / _ETH_ERG[1]
        if recombination_photons:
            # on-the-spot recycling at the CURRENT iterated state (the
            # rates refreeze each outer iteration, like ne)
            nhi_c = ndens * (1.0 - xav)
            nhei_c = nhe * (1.0 - y1av - y2av)
            a2 = p.bhe00 * (temp / 1.0e4) ** p.alhepow * chem.clumping
            a3 = 2.0 * chem.bh00 * (temp / 4.0e4) ** chem.albpow \
                * chem.clumping
            rec2 = ne * a2 * nhe * y1av       # HeII -> HeI photons/vol
            rec3 = ne * a3 * nhe * y2av       # HeIII -> HeII photons/vol
            wh = nhi_c * p.sig_h_he1
            whe = nhei_c * p.sig_he1_he1
            y_f = wh / jnp.maximum(wh + whe, tiny)
            wh2 = nhi_c * p.sig_h_lya2
            whe2 = nhei_c * p.sig_he1_lya2
            z_f = wh2 / jnp.maximum(wh2 + whe2, tiny)
            # per-atom rates, capped like the secondary channel (rate*dt
            # saturates long before 1e12/s; the cap guards the 2x2
            # eigensolve against overflow at vanishing absorber density)
            add_h = (y_f * rec2 + z_f * rec3) / jnp.maximum(nhi_c, tiny)
            add_he = ((1.0 - y_f) * rec2 + (1.0 - z_f) * rec3) \
                / jnp.maximum(nhei_c, tiny)
            ph = ph + jnp.minimum(
                jnp.where(nhi_c > tiny, add_h, 0.0), 1e12)
            phe1 = phe1 + jnp.minimum(
                jnp.where(nhei_c > tiny, add_he, 0.0), 1e12)
        xh_new, xh_av_new = doric(xh, dt, temp, ne, ph, chem)
        y1t, y2t, y1a, y2a = he_update(y1, y2, dt, temp, ne,
                                       phe1, phi_he2, p)
        relx = jnp.abs((xh_av_new - xav) / (1.0 - xh_av_new))
        rel1 = jnp.abs(y1a - y1av) / jnp.maximum(y1a, 1e-10)
        rel2 = jnp.abs(y2a - y2av) / jnp.maximum(y2a, 1e-10)
        done = jnp.logical_or(relx < MIN_FRACTIONAL_CHANGE,
                              (1.0 - xh_av_new) < MIN_FRACTION_OF_ATOMS)
        he_done = (rel1 < MIN_FRACTIONAL_CHANGE) \
            & (rel2 < MIN_FRACTIONAL_CHANGE)
        # with no helium the He fractions must not gate the iteration
        # (exact reduction to the H-only global_pass)
        done = done & jnp.where(jnp.asarray(p.abu_he) > 0.0, he_done, True)
        upd = lambda new, old: jnp.where(active, new, old)
        return (upd(xh_av_new, xav), upd(xh_new, xint),
                upd(y1a, y1av), upd(y1t, y1int),
                upd(y2a, y2av), upd(y2t, y2int),
                active & ~done, nit + 1)

    active0 = jnp.ones(xh.shape, dtype=bool)
    (xav_f, xint_f, y1av_f, y1int_f, y2av_f, y2int_f, _, _) = \
        jax.lax.while_loop(cond, body,
                           (xh_av, xh, y1_av, y1, y2_av, y2,
                            active0, jnp.int32(0)))

    yh_entry = 1.0 - xh_av_entry
    delta = xav_f - xh_av_entry
    not_conv = ((jnp.abs(delta) > MIN_FRACTIONAL_CHANGE)
                & (jnp.abs(delta / yh_entry) > MIN_FRACTIONAL_CHANGE)
                & (yh_entry > MIN_FRACTION_OF_ATOMS))
    if mask is not None:
        not_conv = not_conv & mask
    conv_flag = jnp.sum(not_conv.astype(jnp.int32))
    return (xint_f, xav_f, y1int_f, y1av_f, y2int_f, y2av_f, conv_flag)
