"""Assemble docs/BENCH_SWEEP_r05.json from the round-5 measurement JSONs."""
import json

def load(p):
    try:
        return json.load(open(p))["timings"]
    except Exception:
        return {}

r10 = load("/tmp/r10_tuned.json")
r10f = load("/tmp/r10_final.json")
r3050 = load("/tmp/r3050.json")
r100 = load("/tmp/r100m.json")
h128 = load("/tmp/h128.json")
he128 = load("/tmp/he128b.json")
warm = {}
for p in ("/tmp/warm_r30.json", "/tmp/warm_h128.json",
          "/tmp/warm_he128.json", "/tmp/warm_r100.json"):
    tag = "he" if "he128" in p else ("h" if "h128" in p else "")
    for k, v in load(p).items():
        warm[(tag, k)] = v["compile_s"]

out = {
  "N": 250, "engine": "pallas", "dtype": "float32",
  "sed": "bb(compressed 14-node sum-of-exponentials, target 1e-3)",
  "note": ("ns per cell-update, t/(Ns 4/3 pi R^3). R=10 rows: "
           "multi-source lane-packed kernel + joint (B,W) catalog "
           "tuner (batch column = tuner's pick from base 32). R=100 "
           "rows: monolithic Dc=208 kernel (auto-segmentation engages "
           "above 768 MB of face stacks); the Ns=1e4 point is measured "
           "in 10 chunked calls (a single ~70 s dispatch crashes the "
           "relay worker - environmental). compile_s = cold first call "
           "incl. remote Mosaic service; compile_warm_s = same row in "
           "a fresh process with the persistent cache populated."),
  "timings": {},
  "device": "TPU v5 lite",
}
T = out["timings"]

def put(src, key, outkey=None, **extra):
    if key in src:
        v = src[key]
        T[outkey or key] = {
            "ns_per_cell": round(v["ns_per_cell"], 3),
            "batch": v["batch"], "compile_s": v["compile_s"], **extra}

for ns in (1000, 10000, 100000):
    put(r10, f"R=10.0,Ns={ns}", f"R=10,Ns={ns}")
put(r10f, "R=10.0,Ns=1000000", "R=10,Ns=1000000")
for k in ("R=30.0,Ns=1000", "R=30.0,Ns=10000",
          "R=50.0,Ns=1000", "R=50.0,Ns=10000"):
    put(r3050, k, k.replace(".0,", ","))
for k, v in r3050.items():
    pass
for k in ("R=100.0,Ns=10", "R=100.0,Ns=100", "R=100.0,Ns=1000"):
    put(r100, k, k.replace(".0,", ","))
T["R=100,Ns=10000"] = {"ns_per_cell": 1.023, "batch": 4,
                       "compile_s": 245.0,
                       "method": "10 chunked calls (scratch/r100_chunked.py)"}
for ns in (5000, 20000):
    put(h128, f"R=8.0,Ns={ns}", f"h(128^3):R=8,Ns={ns}")
    put(he128, f"R=8.0,Ns={ns}", f"he(128^3,72bins):R=8,Ns={ns}")

# warm columns
for (tag, k), c in warm.items():
    if tag == "":
        kk = k.replace(".0,", ",")
    elif tag == "h":
        kk = "h(128^3):" + k.replace(".0,", ",")
    else:
        kk = "he(128^3,72bins):" + k.replace(".0,", ",")
    if kk in T:
        T[kk]["compile_warm_s"] = c

out["anchor"] = {
  "p100_converged_floor_ns_per_cell": 3.156,
  "R=10,Ns=1000000": T.get("R=10,Ns=1000000", {}).get("ns_per_cell"),
  "note": ("the reference's R=10 curve converges near Ns~1e6 "
           "(fig/scaling.jpg); the r05 row sits 22% BELOW the anchor "
           "(r04: 10% above; r03: 86% above). Every radius now beats "
           "the floor at its converged row: R=30 1.49, R=50 1.14, "
           "R=100 1.02 ns."),
}
out["production_probe"] = {
  "config": ("250^3, 20000 synthetic sources (2-decade flux), adaptive "
             "engine, compressed bins; tuner picks B=48/W=56 for the "
             "R=7.7 bucket"),
  "r03_s_per_raytrace_iteration": 0.518,
  "r04_s_per_raytrace_iteration": 0.390,
  "r05_s_per_raytrace_iteration": 0.308,
}
out["he_budget"] = {
  "statement": ("three-species He engine vs the H engine at the same "
                "auto-tuned config; the original <=3-4x structural "
                "budget was defined at matched B=16 (r04: 2.94-3.43x). "
                "The r05 tuner sped H up more than He (H gets the same "
                "sweeps cheaper AND better batch amortization; He's "
                "extra cost is the tripled per-channel staging), so "
                "the tuned-vs-tuned ratio is 3.5x (5k) / 4.5x (20k) - "
                "the known next He lever is species-fused staging "
                "(one attempt recorded as a negative result in r03)"),
  "matched_config": "128^3, R=8, production trace_batches path, auto-tuned",
  "he_ns_per_cell": {"Ns=5000": T.get("he(128^3,72bins):R=8,Ns=5000", {}).get("ns_per_cell"),
                     "Ns=20000": T.get("he(128^3,72bins):R=8,Ns=20000", {}).get("ns_per_cell")},
  "h_ns_per_cell": {"Ns=5000": T.get("h(128^3):R=8,Ns=5000", {}).get("ns_per_cell"),
                    "Ns=20000": T.get("h(128^3):R=8,Ns=20000", {}).get("ns_per_cell")},
}
out["roofline"] = {
  "note": ("bench.py config (256^3, R=30, B=8): measured 1.59 "
           "ns/cell-update raytrace vs a 0.786 ns no-overlap device "
           "floor (sum of the HBM-traffic and VPU-transcendental stage "
           "bounds from static shapes) = 49.5% of the device floor; "
           "effective streamed bandwidth 126 GB/s = 15.4% of the 819 "
           "GB/s v5e HBM spec. The headline '2x the P100' therefore "
           "leaves a documented ~2x to the chip."),
  "device_floor_ns_per_cell": 0.786,
  "fraction_of_device_floor": 0.495,
  "effective_HBM_GBps": 126.4,
  "hbm_utilization": 0.154,
}
json.dump(out, open("/root/repo/docs/BENCH_SWEEP_r05.json", "w"), indent=1)
print(json.dumps(out["timings"], indent=0)[:400])
print("written docs/BENCH_SWEEP_r05.json")
