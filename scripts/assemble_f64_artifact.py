import json
import os

sizes = {}
for n in (12288, 49152):
    entry = None
    for d in (2, 8):
        p = f"/tmp/f64_{n}_{d}.json"
        if not os.path.exists(p):
            mesh_entry = {"status": "not measured: run did not complete "
                          "within the round-5 wall budget (2-core host; "
                          "wall times on the virtual CPU mesh are "
                          "contention-bound lower bounds)"}
        else:
            art = json.load(open(p))
            m = art["mesh"][str(d)]
            mesh_entry = {
                "wall_s": m["wall_s"],
                "oversubscribed": m["oversubscribed"],
                "cg_iters_per_lm": m["cg_iters_per_lm"],
                "chi2_f32": m["chi2_f32"],
                "parity_max_xy_m": m["parity_max_xy_m"],
                "parity_max_heading_rad": m["parity_max_heading_rad"],
            }
            if entry is None:
                entry = {
                    "edges": art["edges"],
                    "host_sparse_s": art.get("host_sparse_s"),
                    "chi2_f32_host": art.get("chi2_f32_host"),
                    "mesh": {},
                }
        if entry is None:
            entry = {"mesh": {}}
        entry["mesh"][str(d)] = mesh_entry
    sizes[str(n)] = entry

out = {
    "dtype": "f64",
    "cg_rtol": 1e-11,
    "coarse_aggregate_nodes": 16,
    "max_coarse_aggregates": 4096,
    "physical_cores": 2,
    "round": 5,
    "sizes": sizes,
    "note": (
        "Round-5 completion of the f64 matrix (VERDICT r4 next #3): "
        "max_coarse raised to 4096 for f64 so 49k keeps the 16-node "
        "aggregates (round 4 silently doubled them to 32 past 2048 "
        "aggregates - the source of the 49k CG creep to 38-39), and "
        "--xla_cpu_collective_timeout_seconds=900 retires the CPU-mesh "
        "rendezvous watchdog that killed the round-4 49k x 8 run (the "
        "watchdog now logs 'Thread is unstuck' false-positives and "
        "continues). CG counts and parity are deterministic; wall "
        "times on the shared-host virtual mesh are contention-bound "
        "lower bounds (the 49k runs overlapped the round-5 test "
        "suite). f64 CG runs to rtol 1e-11 (sub-mm host parity), six "
        "decades past f32's resolvability floor."
    ),
}
with open("/root/repo/DIST_SCALING_F64.json", "w") as f:
    json.dump(out, f, indent=1)
print("wrote DIST_SCALING_F64.json")
for n, e in sizes.items():
    for d, m in e["mesh"].items():
        print(n, "x", d, m.get("cg_iters_per_lm", m.get("status", "?")),
              m.get("parity_max_xy_m"))
