"""Abstract simulation base class.

TPU-native equivalent of the reference's ``C2Ray`` base class
(pyc2ray/c2ray_base.py:83-512): owns parameters, grid, cosmology,
radiation tables, the raytracer and the time-evolution methods. Concrete
simulations (test case, CubeP3M-coupled, 244Mpc paper variant) subclass it
and override the ``_*_init`` hooks, exactly like the reference's template
pattern (c2ray_base.py:466-484).

Differences from the reference:
* No GPU memory management layer is needed — XLA owns device buffers; the
  "device_init/device_close" lifecycle (asora_core.py:20-58) has no
  equivalent and is gone.
* ``use_mpi`` is replaced by an optional ``jax.sharding.Mesh``; source
  parallelism is expressed with shard_map + psum instead of
  mpi4py Reduce/Bcast (see parallel/source_parallel.py).
* A defaults layer for the YAML parameters (the reference TODO at
  c2ray_base.py:64-67).
"""

import re

import numpy as np
import jax.numpy as jnp
import yaml

from ..constants import Mpc, YEAR, ev2fr, ev2k
from ..cosmology import FlatLambdaCDM
from ..evolve import evolve3D
from ..ops.chemistry import ChemistryParams
from ..ops.raytrace import RaytraceConfig, Raytracer
from ..radiation import BlackBodySource, make_tau_table
from ..utils.logutils import printlog
from ..utils.sourceutils import format_sources

try:
    from yaml import CSafeLoader as SafeLoader
except ImportError:
    from yaml import SafeLoader

__all__ = ["C2RaySimulation"]

# Defaults for optional YAML keys (reference requires every key; missing ->
# KeyError, TODO noted at c2ray_base.py:64-67)
_DEFAULTS = {
    "Grid": {"resume": 0},
    "Photo": {"compute_heating_rates": 0, "grey": 0,
              "SourceType": "blackbody", "secondary_ionization": 0,
              "secondary_ramp": 0, "recombination_photons": 0},
    "Raytracing": {"source_batch_size": 8, "convergence_fraction": 1e-4,
                   "loss_fraction": 1e-2, "subboxsize": 150,
                   "max_subbox": 1000, "dtype": "float64",
                   "engine": "flat"},
    "Output": {"logfile": "pyC2Ray.log"},
}


class C2RaySimulation:
    """Base class for a C2Ray-style reionization simulation on TPU."""

    def __init__(self, paramfile, Nmesh, use_gpu=True, use_mpi=None,
                 mesh=None):
        """
        Parameters
        ----------
        paramfile : str
            YAML parameter file (same schema as the reference pyc2ray).
        Nmesh : int
            Mesh size.
        use_gpu : bool
            Accepted for API compatibility with the reference constructor
            signature (c2ray_base.py:84); the TPU raytracer is always used.
        use_mpi : optional
            Accepted for API compatibility; ignored (see ``mesh``).
        mesh : jax.sharding.Mesh, optional
            Device mesh for multi-chip source-parallel raytracing.
        """
        del use_gpu, use_mpi  # single code path on TPU
        self.rank = 0
        self.mesh = mesh

        self._read_paramfile(paramfile)
        self.N = Nmesh
        self.shape = (Nmesh, Nmesh, Nmesh)

        self._param_init()
        self._output_init()
        self._grid_init()
        self._cosmology_init()
        self._redshift_init()
        self._material_init()
        self._sources_init()
        self._radiation_init()
        self._raytracer_init()
        self.printlog("Starting simulation... \n\n")

    # ==================================================================
    # TIME-EVOLUTION METHODS (c2ray_base.py:147-257)
    # ==================================================================
    def set_timestep(self, z1, z2, num_timesteps):
        """Timestep between two redshift slices, in seconds
        (c2ray_base.py:147-168)."""
        t1 = self.cosmology.lookback_time(z1)
        t2 = self.cosmology.lookback_time(z2)
        return (t1 - t2) / num_timesteps

    def evolve3D(self, dt, src_flux, src_pos):
        """Evolve the grid over one timestep (c2ray_base.py:170-226).

        src_pos is (3, NumSrc) 1-indexed (reference convention).

        Dispatch mirrors the reference's single/MPI switch
        (c2ray_base.py:185-226): with no mesh the single-device path
        runs; a ("src","space") mesh selects the source-parallel psum
        path; a ("di","dj") mesh selects the domain-decomposed
        halo-exchange path (beyond reference)."""
        pos, flux = format_sources(src_pos, src_flux)
        if getattr(self, "multi_species", False):
            common = dict(convergence_fraction=self.convergence_fraction,
                          logfile=self.logfile, quiet=False,
                          thermal=self.thermal, zred=self.zred,
                          loss_fraction=self.loss_fraction)
            if self.mesh is not None and "di" in self.mesh.axis_names:
                from ..parallel.domain import (DomainDecomposition,
                                               evolve3D_he_domain)
                if getattr(self, "_decomp", None) is None:
                    self._decomp = DomainDecomposition(self.raytracer,
                                                       self.mesh)
                out = evolve3D_he_domain(
                    dt, self.dr, flux, pos, self._decomp, self.chem_he,
                    self.temp, self.ndens, self.xh, self.xhe1, self.xhe2,
                    **common)
            elif self.mesh is not None:
                from ..parallel.source_parallel import evolve3D_he_sharded
                out = evolve3D_he_sharded(
                    dt, self.dr, flux, pos, self.raytracer, self.mesh,
                    self.chem_he, self.temp, self.ndens, self.xh,
                    self.xhe1, self.xhe2, **common)
            else:
                from ..evolve import evolve3D_he
                out = evolve3D_he(
                    dt, self.dr, flux, pos, self.raytracer, self.chem_he,
                    self.temp, self.ndens, self.xh, self.xhe1, self.xhe2,
                    **common)
            (self.xh, self.phi_ion, self.xhe1, self.xhe2,
             self.phi_he1, self.phi_he2) = out[:6]
            if self.thermal is not None:
                self.temp = out[6]
            return
        if self.mesh is not None and "di" not in self.mesh.axis_names \
                and not hasattr(self.raytracer, "shard_trace"):
            raise NotImplementedError(
                f"engine {type(self.raytracer).__name__} does not support "
                "the source-parallel mesh (no shard_trace); use engine: "
                "cheb, pallas or flat under a mesh")
        if self.mesh is not None and "di" in self.mesh.axis_names:
            from ..parallel.domain import (DomainDecomposition,
                                           evolve3D_domain)
            if getattr(self, "_decomp", None) is None:
                self._decomp = DomainDecomposition(self.raytracer, self.mesh)
            out = evolve3D_domain(
                dt, self.dr, flux, pos, self._decomp, self.chem,
                self.temp, self.ndens, self.xh,
                convergence_fraction=self.convergence_fraction,
                logfile=self.logfile, quiet=False,
                thermal=self.thermal, zred=self.zred,
                loss_fraction=self.loss_fraction)
            if self.thermal is not None:
                self.xh, self.phi_ion, self.temp = out
            else:
                self.xh, self.phi_ion = out
        elif self.mesh is not None:
            from ..parallel.source_parallel import evolve3D_sharded
            out = evolve3D_sharded(
                dt, self.dr, flux, pos, self.raytracer, self.mesh,
                self.chem, self.temp, self.ndens, self.xh,
                convergence_fraction=self.convergence_fraction,
                logfile=self.logfile, quiet=False,
                thermal=self.thermal, zred=self.zred,
                loss_fraction=self.loss_fraction)
            if self.thermal is not None:
                self.xh, self.phi_ion, self.temp = out
            else:
                self.xh, self.phi_ion = out
        else:
            out = evolve3D(
                dt, self.dr, flux, pos, self.raytracer, self.chem,
                self.temp, self.ndens, self.xh,
                convergence_fraction=self.convergence_fraction,
                logfile=self.logfile, quiet=False,
                thermal=self.thermal, zred=self.zred,
                loss_fraction=self.loss_fraction)
            if self.thermal is not None:
                self.xh, self.phi_ion, self.temp = out
            else:
                self.xh, self.phi_ion = out

    def cosmo_evolve(self, dt):
        """Dilute density / contract cell size over a timestep using the
        half-step redshift convention (c2ray_base.py:229-257)."""
        t_now = self.time
        t_half = t_now + 0.5 * dt
        t_after = t_now + dt
        z_half = self.time2zred(t_half)
        if self.cosmological:
            dilution = ((1 + z_half) / (1 + self.zred)) ** 3
            self.ndens = self.ndens * dilution
            self.dr = self.dr_c * self.cosmology.scale_factor(z_half)
            if not getattr(self, "isothermal", True):
                # adiabatic cooling of the expanding gas: T ~ rho^(2/3)
                self.temp = self.temp * dilution ** (2.0 / 3.0)
        self.zred = z_half
        self.time = t_after

    def do_raytracing(self, src_flux, src_pos, stats=False):
        """Standalone Gamma computation (c2ray_base.py:300-323).

        With ``stats=True`` also returns a diagnostics dict with the
        photon-loss fraction (and, for the adaptive engine, the bucket
        assignment) — the analog of the reference's
        ``do_raytracing(..., stats=True) -> (phi, nsubbox, photonloss)``
        (reference raytracing.py:105-108; nsubbox has no equivalent
        under static shapes, bucket counts play that role)."""
        pos, flux = format_sources(src_pos, src_flux)
        if getattr(self, "multi_species", False):
            g = self.raytracer.trace(self.ndens, self.xh, self.xhe1,
                                     self.xhe2, pos, flux, self.dr)
            self.phi_ion = np.asarray(g[0])
            self.phi_he1 = np.asarray(g[1])
            self.phi_he2 = np.asarray(g[2])
            if stats:
                from ..diagnostics import photon_budget
                st = photon_budget(self.phi_ion, self.ndens, self.xh,
                                   flux, self.dr)
                return self.phi_ion, st
            return self.phi_ion
        bucket_stats = None
        if getattr(self.raytracer, "needs_flux_bucketing", False):
            out = self.raytracer.trace(self.ndens, self.xh, pos, flux,
                                       self.dr, stats=True)
            out, bucket_stats = out
        else:
            out = self.raytracer.trace(self.ndens, self.xh, pos, flux,
                                       self.dr)
        if self.raytracer.config.do_heating and bucket_stats is None:
            self.phi_ion = np.asarray(out[0])
            self.phi_heat = np.asarray(out[1])
        else:
            self.phi_ion = np.asarray(out)
        if stats:
            from ..diagnostics import photon_budget
            st = photon_budget(self.phi_ion, self.ndens, self.xh,
                               flux, self.dr)
            if bucket_stats is not None:
                st.update(bucket_stats)
            return self.phi_ion, st
        return self.phi_ion

    # ==================================================================
    # UTILITY METHODS
    # ==================================================================
    def time2zred(self, t):
        return self.cosmology.z_at_age(t)

    def zred2time(self, z, unit="s"):
        t = self.cosmology.age(z)
        return t / YEAR if unit in ("yr", "yrs") else t

    def printlog(self, s, quiet=False):
        if self.logfile is None:
            raise RuntimeError("Please set the log file in _output_init")
        printlog(s, self.logfile, quiet)

    def write_output(self, z):
        pass

    # ==================================================================
    # INITIALIZATION (private; template hooks as in c2ray_base.py:466-484)
    # ==================================================================
    def _param_init(self):
        """CGS constants & misc parameters -> attributes
        (c2ray_base.py:329-352)."""
        ld = self._ld
        self.eth0 = ld["CGS"]["eth0"]
        self.ethe0 = ld["CGS"]["ethe0"]
        self.ethe1 = ld["CGS"]["ethe1"]
        self.bh00 = ld["CGS"]["bh00"]
        self.fh0 = ld["CGS"]["fh0"]
        self.xih0 = ld["CGS"]["xih0"]
        self.albpow = ld["CGS"]["albpow"]
        self.abu_h = ld["Abundances"]["abu_h"]
        self.abu_he = ld["Abundances"]["abu_he"]
        self.mean_molecular = self.abu_h + 4.0 * self.abu_he
        self.abu_c = ld["Abundances"]["abu_c"]
        self.colh0 = ld["CGS"]["colh0_fact"] * self.fh0 * self.xih0 / self.eth0 ** 2
        self.temph0 = self.eth0 * ev2k
        self.sig = ld["Photo"]["sigma_HI_at_ion_freq"]
        self.loss_fraction = ld["Raytracing"]["loss_fraction"]
        self.convergence_fraction = ld["Raytracing"]["convergence_fraction"]
        self.max_subbox = ld["Raytracing"]["max_subbox"]
        self.subboxsize = ld["Raytracing"]["subboxsize"]
        self.chem = ChemistryParams(
            bh00=self.bh00, albpow=self.albpow, colh0=self.colh0,
            temph0=self.temph0, abu_c=self.abu_c)
        # Non-isothermal mode (beyond reference; the reference declares
        # the thermal chemistry TODO, README.md:81-87): Material.isothermal
        # defaults to true = reference behavior. When false, evolve3D
        # advances the temperature with the photoheating rates.
        self.isothermal = bool(ld["Material"].get("isothermal", True))
        if not self.isothermal:
            from ..ops.thermal import ThermalParams
            self.thermal = ThermalParams(
                bh00=self.bh00, albpow=self.albpow, colh0=self.colh0,
                temph0=self.temph0, abu_c=self.abu_c)
        else:
            self.thermal = None

    def _cosmology_init(self):
        """(c2ray_base.py:354-373)"""
        ld = self._ld
        h = ld["Cosmology"]["h"]
        self.cosmology = FlatLambdaCDM(
            100 * h, ld["Cosmology"]["Omega0"],
            Tcmb0=ld["Cosmology"]["cmbtemp"], Ob0=ld["Cosmology"]["Omega_B"])
        self.cosmological = bool(ld["Cosmology"]["cosmological"])
        self.zred_0 = ld["Cosmology"]["zred_0"]
        self.age_0 = self.zred2time(self.zred_0)
        if self.cosmological:
            self.printlog(
                f"Cosmology is on, scaling comoving quantities to the "
                f"initial redshift, which is z0 = {self.zred_0:.3f}...")
            self.dr = self.cosmology.scale_factor(self.zred_0) * self.dr_c
        else:
            self.printlog("Cosmology is off.")

    def _radiation_init(self):
        """Radiation tables (c2ray_base.py:375-443)."""
        ld = self._ld
        self.minlogtau = ld["Photo"]["minlogtau"]
        self.maxlogtau = ld["Photo"]["maxlogtau"]
        self.NumTau = ld["Photo"]["NumTau"]
        self.SourceType = ld["Photo"]["SourceType"]
        self.grey = bool(ld["Photo"]["grey"])
        self.compute_heating_rates = bool(ld["Photo"]["compute_heating_rates"])
        self.secondary_ionization = bool(
            ld["Photo"]["secondary_ionization"])
        self.secondary_ramp = bool(ld["Photo"]["secondary_ramp"])
        self.recombination_photons = bool(
            ld["Photo"]["recombination_photons"])

        self.tau, self.dlogtau = make_tau_table(
            self.minlogtau, self.maxlogtau, self.NumTau)

        ion_freq_HI = ev2fr * self.eth0
        ion_freq_HeII = ev2fr * self.ethe1

        if self.SourceType == "blackbody":
            freq_min = ion_freq_HI
            freq_max = 10 * ion_freq_HeII
            self.bb_Teff = ld["BlackBodySource"]["Teff"]
            self.cs_pl_idx_h = ld["BlackBodySource"]["cross_section_pl_index"]
            radsource = BlackBodySource(self.bb_Teff, self.grey,
                                        ion_freq_HI, self.cs_pl_idx_h)
            self.printlog(
                f"Using Black-Body sources with effective temperature "
                f"T = {radsource.temp:.1e} K")
            self.printlog("Integrating photoionization rates tables...")
            self.photo_thin_table, self.photo_thick_table = \
                radsource.make_photo_table(self.tau, freq_min, freq_max, 1e48)
            if self.compute_heating_rates:
                self.printlog("Integrating photoheating rates tables...")
                self.heat_thin_table, self.heat_thick_table = \
                    radsource.make_heat_table(self.tau, freq_min, freq_max, 1e48)
            else:
                self.heat_thin_table = np.zeros(self.NumTau + 1)
                self.heat_thick_table = np.zeros(self.NumTau + 1)
        else:
            raise NameError("Unknown source type: " + str(self.SourceType))

    def _raytracer_init(self):
        """Build the TPU raytracer (replaces device_init + table upload,
        asora_core.py:20-58)."""
        ld = self._ld
        batch = int(ld["Raytracing"]["source_batch_size"])
        dtype_name = str(ld["Raytracing"].get("dtype", "float64"))
        dtype = {"float64": jnp.float64, "f64": jnp.float64,
                 "float32": jnp.float32, "f32": jnp.float32}[dtype_name]
        if dtype == jnp.float64:
            import jax
            jax.config.update("jax_enable_x64", True)
        engine = str(ld["Raytracing"].get("engine", "flat"))
        valid_engines = ("flat", "cheb", "pallas", "adaptive", "he", "box")
        if engine not in valid_engines:
            raise ValueError(
                f"Unknown Raytracing.engine: {engine!r}. Valid engines: "
                f"{', '.join(valid_engines)} (flat = reference-exact "
                f"octahedral f64 tables; cheb = Chebyshev-face XLA sweep; "
                f"pallas = cheb with the Pallas TPU kernel; adaptive = "
                f"pallas with flux-bucketed per-source radii; he = "
                f"three-species H+He; box = octahedral sheet-batched "
                f"formulation)")
        # The reference's CPU subbox knobs (parameters.yml Raytracing:
        # subboxsize/max_subbox; raytracing.f90:183-226) map onto the
        # adaptive bucket policy: subboxsize -> minimum bucket radius,
        # max_subbox -> radius cap (both clamped to R_max_LLS, like the
        # reference clamps the subbox to the grid). They only act when
        # the USER sets them — and only the adaptive engine consumes
        # them, exactly as only the reference's CPU raytracer does (its
        # ASORA/GPU path ignores them, evolve.py:154). On any other
        # engine a user-set value is announced as unused, not silent.
        user_subbox = ({"subboxsize", "max_subbox"}
                       & set(self._user_keys.get("Raytracing", ())))
        if user_subbox and engine != "adaptive":
            self.printlog(
                f"NOTE: Raytracing.{'/'.join(sorted(user_subbox))} "
                f"configure the reference's CPU subbox machinery; here "
                f"only Raytracing.engine: adaptive consumes them "
                f"(subboxsize -> minimum bucket radius, max_subbox -> "
                f"radius cap). engine: {engine} traces every source at "
                f"R_max_LLS and ignores them — matching the reference's "
                f"own GPU path.")
        self.multi_species = (engine == "he")
        if self.secondary_ionization and engine != "he":
            raise ValueError(
                "Photo.secondary_ionization: 1 requires Raytracing."
                "engine: he (the Shull & van Steenberg redistribution "
                "needs the three-species photoelectron energy channel)")
        if self.recombination_photons and engine != "he":
            raise ValueError(
                "Photo.recombination_photons: 1 requires Raytracing."
                "engine: he (recycling redistributes HELIUM "
                "recombination radiation; the hydrogen-only engines "
                "already assume case-B on-the-spot for H)")
        if engine == "he":
            # helium extension (beyond reference): three-species engine +
            # coupled H/He chemistry; see ops/raytrace_he.py
            from ..ops.raytrace_he import HeRaytracer
            from ..radiation.helium import make_spectral_bins_he, DEFAULT_PL
            from ..ops.chemistry_he import HeChemistryParams
            # 3x8 = 72 bins over 3 bands: worst-case 3.4e-4 (photo) /
            # 1.1e-3 (heat) relative error vs a 768-bin dense reference
            # over per-species tau in [1e-6, 1e4] (scratch/he_bins_acc.py;
            # docs/TPU_PERFORMANCE_NOTES.md). The He rate pass is the
            # engine's dominant cost and scales linearly with the bin
            # count; raise bins_panels for accuracy studies.
            panels = int(ld["Raytracing"].get("bins_panels", 3))
            nodes = int(ld["Raytracing"].get("bins_nodes", 8))
            # honor the configured HI cross-section slope in the He bins
            # (HeI/HeII keep the standard defaults)
            pl = (float(self.cs_pl_idx_h), DEFAULT_PL[1], DEFAULT_PL[2])
            # Raytracing.cross_sections: powerlaw (reference family,
            # default) | verner (Verner et al. 1996 analytic fits)
            cs_model = str(ld["Raytracing"].get("cross_sections",
                                                "powerlaw"))
            if cs_model == "verner" and float(self.cs_pl_idx_h) != 2.8:
                raise ValueError(
                    "BlackBodySource.cross_section_pl_index = "
                    f"{self.cs_pl_idx_h!r} conflicts with Raytracing."
                    "cross_sections: verner — the Verner fits fix the "
                    "frequency dependence and would silently ignore the "
                    "configured slope; drop one of the two settings")
            bins = make_spectral_bins_he(
                BlackBodySource(self.bb_Teff, self.grey,
                                ev2fr * self.eth0, self.cs_pl_idx_h),
                panels_per_band=panels, nodes=nodes, pl=pl,
                cross_section_model=cs_model)
            he_acc = str(ld["Raytracing"].get("accumulate", "auto"))
            he_ws = ld["Raytracing"].get("window_size", None)
            self.raytracer = HeRaytracer(
                self.N, float(self.R_max_LLS), bins, self.abu_he,
                batch_size=batch, dtype=dtype,
                use_pallas=bool(ld["Raytracing"].get("use_pallas", False)),
                do_heating=self.compute_heating_rates,
                accumulate=he_acc,
                window_size=None if he_ws is None else int(he_ws))
            if self.thermal is not None and not self.compute_heating_rates:
                raise ValueError(
                    "Material.isothermal: false with engine: he requires "
                    "Photo.compute_heating_rates: 1 (the He engine "
                    "accumulates heating only when asked)")
            if self.secondary_ionization and not self.compute_heating_rates:
                raise ValueError(
                    "Photo.secondary_ionization: 1 requires "
                    "Photo.compute_heating_rates: 1 (the heat channel "
                    "carries the photoelectron energy being "
                    "redistributed into HI/HeI collisional ionizations)")
            # OTS recycling cross sections from the SAME cross-section
            # model the raytracer bins use (powerlaw family honors the
            # configured HI slope; verner uses the analytic fits)
            from ..radiation.helium import (cross_section,
                                            verner_cross_section,
                                            HE_EDGES_EV)
            cs = (verner_cross_section if cs_model == "verner"
                  else lambda nu, s: cross_section(
                      nu, s, pl=pl[s]))
            nu_he1 = ev2fr * HE_EDGES_EV[1]
            nu_lya2 = ev2fr * 40.8
            # opt-in energy ramp on the SvS secondary fractions
            # (radiation.helium.secondary_ramps; soft-SED correction)
            ramps = (1.0, 1.0)
            if self.secondary_ramp:
                if not self.secondary_ionization:
                    raise ValueError(
                        "Photo.secondary_ramp: 1 modifies the secondary-"
                        "ionization channel; set Photo."
                        "secondary_ionization: 1 too (or drop the ramp)")
                from ..radiation.helium import secondary_ramps
                ramps = secondary_ramps(bins, self.abu_he)
                self.printlog(
                    f"Secondary-ionization energy ramps (SED-averaged "
                    f"threshold interpolation): f_ion,HI x "
                    f"{ramps[0]:.3f}, f_ion,HeI x {ramps[1]:.3f}")
            self.chem_he = HeChemistryParams(
                chem=self.chem, abu_he=self.abu_he,
                secondary=self.secondary_ionization,
                recombination_photons=self.recombination_photons,
                sig_h_he1=float(cs(nu_he1, 0)),
                sig_he1_he1=float(cs(nu_he1, 1)),
                sig_h_lya2=float(cs(nu_lya2, 0)),
                sig_he1_lya2=float(cs(nu_lya2, 1)),
                sec_ramp_hi=float(ramps[0]),
                sec_ramp_hei=float(ramps[1]))
            # He ionization state (xHeII, xHeIII fractions)
            if not hasattr(self, "xhe1"):
                self.xhe1 = np.full(self.shape, 1e-3)
                self.xhe2 = np.zeros(self.shape)
            self.printlog(
                f"Using three-species (H+He) raytracing "
                f"({bins.num_bins} bins over 3 bands, abu_he = "
                f"{self.abu_he:.3g}, batch = {batch:n})")
            return
        if engine in ("cheb", "pallas", "adaptive", "box"):
            # production fast path: Chebyshev-face sweep + spectral bins
            from ..ops.raytrace_cheb import ChebRaytracer
            from ..radiation.spectral_bins import make_spectral_bins
            ion_freq_HI = ev2fr * self.eth0
            # quadrature resolution knobs. The 4x8 = 32-bin default is
            # ~5x MORE accurate than the reference's NumTau=2000
            # log-linear table (1.5e-3 vs 7.3e-3 worst-case relative rate
            # error over tau in [0, 1e4]; scratch measurement recorded in
            # docs/TPU_PERFORMANCE_NOTES.md). Raise to 6x8/8x8 for
            # golden-tolerance accuracy studies.
            panels = int(ld["Raytracing"].get("bins_panels", 4))
            nodes = int(ld["Raytracing"].get("bins_nodes", 8))
            # Raytracing.bins_compress: sum-of-exponentials compression
            # (radiation/bins_compress.py). "auto"/true (default)
            # compresses a DENSE 768-bin quadrature to a ~14-node sum at
            # 1e-3 uniform relative error on the band (F, G) functions —
            # simultaneously ~16x MORE accurate than the legacy 32-bin
            # default (2.5e-4 vs 4.0e-3 vs dense) and ~2.3x fewer exp
            # evaluations in the compute-bound rate pass. A float sets
            # the target; 0/false keeps the legacy GL bins.
            comp = ld["Raytracing"].get("bins_compress", "auto")
            if comp in ("auto", True):
                comp = 1e-3
            comp = 0.0 if comp in (False, None) else float(comp)
            if comp > 0:
                from ..radiation.bins_compress import compress_bins
                dense = make_spectral_bins(
                    BlackBodySource(self.bb_Teff, self.grey, ion_freq_HI,
                                    self.cs_pl_idx_h),
                    ion_freq_HI, 10 * ev2fr * self.ethe1,
                    panels=48, nodes=16)
                bins = compress_bins(dense, target_rel=comp)
                self.printlog(
                    f"Spectral bins: compressed {dense.num_bins} dense "
                    f"-> {bins.num_bins} nodes (target {comp:g})")
            else:
                bins = make_spectral_bins(
                    BlackBodySource(self.bb_Teff, self.grey, ion_freq_HI,
                                    self.cs_pl_idx_h),
                    ion_freq_HI, 10 * ev2fr * self.ethe1,
                    panels=panels, nodes=nodes)
            # Gamma accumulation strategy (see ChebRaytracer docstring):
            # auto picks the spatially-packed window-matmul accumulate
            # for small boxes, per-source scan RMW for large ones
            accumulate = str(ld["Raytracing"].get("accumulate", "auto"))
            window_size = ld["Raytracing"].get("window_size", None)
            window_size = None if window_size is None else int(window_size)
            if engine == "adaptive":
                # flux-bucketed per-source radii: the production answer
                # to the reference's subbox machinery (consumes
                # Raytracing.loss_fraction via the per-iteration
                # photon-loss warning in the evolve loop)
                from ..ops.adaptive import AdaptiveRaytracer
                safety = float(ld["Raytracing"].get("adaptive_safety", 2.0))
                radii = ld["Raytracing"].get("adaptive_radii", None)
                # user-set subbox keys steer the bucket policy (cells):
                # subboxsize = smallest per-source radius, max_subbox =
                # hard radius cap; both clamp to R_max_LLS the way the
                # reference clamps its subbox to the grid (a subboxsize
                # beyond the cap degrades to a single full-radius bucket)
                r_cap = float(self.R_max_LLS)
                if "max_subbox" in user_subbox:
                    r_cap = min(r_cap, float(self.max_subbox))
                r_min = (min(float(self.subboxsize), r_cap)
                         if "subboxsize" in user_subbox else 4.0)
                self.raytracer = AdaptiveRaytracer(
                    self.N, r_cap, float(self.sig), bins,
                    radii=radii, batch_size=batch, dtype=dtype,
                    use_pallas=True, safety=safety, R_min=r_min,
                    do_heating=self.compute_heating_rates,
                    accumulate=accumulate, window_size=window_size)
                self.printlog(
                    f"Using TPU adaptive-radius raytracing (buckets R = "
                    f"{self.raytracer.radii}, safety = {safety:g}, "
                    f"{bins.num_bins} spectral bins, batch = {batch:n}, "
                    f"dtype = {dtype_name})")
                return
            if engine == "box":
                # octahedral sheet-batched formulation (the stepping
                # stone to the cheb engine; kept as a selectable
                # alternative — gather-free like cheb but sweeping
                # L1 octahedron sheets)
                from ..ops.raytrace_box import BoxRaytracer
                self.raytracer = BoxRaytracer(
                    self.N, float(self.R_max_LLS), float(self.sig), bins,
                    batch_size=batch, dtype=dtype,
                    do_heating=self.compute_heating_rates)
                self.printlog(
                    f"Using TPU octahedral sheet raytracing "
                    f"({bins.num_bins} spectral bins, batch = {batch:n}, "
                    f"dtype = {dtype_name})")
                return
            self.raytracer = ChebRaytracer(
                self.N, float(self.R_max_LLS), float(self.sig), bins,
                batch_size=batch, dtype=dtype,
                do_heating=self.compute_heating_rates,
                use_pallas=(engine == "pallas"),
                accumulate=accumulate, window_size=window_size)
            self.printlog(
                f"Using TPU Chebyshev-face raytracing (r_max = "
                f"{self.raytracer.geom.r_max:n}, {bins.num_bins} spectral "
                f"bins, batch = {batch:n}, dtype = {dtype_name})")
        else:
            cfg = RaytraceConfig(
                N=self.N, R_max_LLS=float(self.R_max_LLS),
                sig=float(self.sig), batch_size=batch, dtype=dtype,
                do_heating=self.compute_heating_rates)
            self.raytracer = Raytracer(
                cfg, self.photo_thin_table, self.photo_thick_table,
                self.minlogtau, self.dlogtau,
                self.heat_thin_table, self.heat_thick_table)
            q_max = self.raytracer.geom_np.max_q
            self.printlog(
                f"Using TPU octahedral raytracing (q_max = {q_max:n}, "
                f"batch = {batch:n}, dtype = {dtype_name})")

    def _grid_init(self):
        """(c2ray_base.py:445-462)"""
        ld = self._ld
        self.boxsize_c = ld["Grid"]["boxsize"] * Mpc
        self.dr_c = self.boxsize_c / self.N
        self.printlog(f"Welcome! Mesh size is N = {self.N:n}.")
        self.printlog(f"Simulation box size (comoving Mpc): "
                      f"{self.boxsize_c/Mpc:.3e}")
        self.dr = self.dr_c
        self.R_max_LLS = (ld["Photo"]["R_max_cMpc"] * self.N
                          / ld["Grid"]["boxsize"])
        self.printlog(f"Maximum comoving distance for photons from source "
                      f"(type 3 LLS): {ld['Photo']['R_max_cMpc']:.3e} cMpc "
                      f"= {self.R_max_LLS:.3f} grid cells.")

    # -- subclass hooks -------------------------------------------------
    def _output_init(self):
        pass

    def _redshift_init(self):
        pass

    def _material_init(self):
        pass

    def _sources_init(self):
        pass

    # ==================================================================
    # PRIVATE
    # ==================================================================
    def _read_paramfile(self, paramfile):
        """YAML with scientific-notation float resolver
        (c2ray_base.py:490-507) + defaults layer."""
        loader = SafeLoader
        loader.add_implicit_resolver(
            "tag:yaml.org,2002:float",
            re.compile(r"""^(?:
             [-+]?(?:[0-9][0-9_]*)\.[0-9_]*(?:[eE][-+]?[0-9]+)?
            |[-+]?(?:[0-9][0-9_]*)(?:[eE][-+]?[0-9]+)
            |\.[0-9_]+(?:[eE][-+][0-9]+)?
            |[-+]?[0-9][0-9_]*(?::[0-5]?[0-9])+\.[0-9_]*
            |[-+]?\.(?:inf|Inf|INF)
            |\.(?:nan|NaN|NAN))$""", re.X),
            list("-+0123456789."))
        with open(paramfile, "r") as f:
            self._ld = yaml.load(f, loader)
        # remember which keys the USER set before the defaults layer fills
        # the rest: some reference keys (subboxsize/max_subbox) are only
        # meaningful when explicitly configured and must not act — or
        # warn — at their defaulted values
        self._user_keys = {sec: frozenset(self._ld.get(sec) or ())
                           for sec in _DEFAULTS}
        for section, defaults in _DEFAULTS.items():
            sec = self._ld.setdefault(section, {})
            for key, val in defaults.items():
                sec.setdefault(key, val)
