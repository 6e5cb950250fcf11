import json

def load(p):
    with open(p) as f:
        return json.load(f)

ref = load("/tmp/c3_ref_final.json")
dele = load("/tmp/c3_del_final.json")
marg = load("/tmp/c3_marg_final.json")

def variant(art, desc):
    keys = ("load_1m", "contended", "value_no_exclusions", "final_nodes",
            "survivors_ate_m", "online_err_p50_m", "online_err_p95_m",
            "online_err_max_m", "tail_growth_nodes_per_scan",
            "nodes_vs_scans", "scans_processed", "wall_s")
    out = {"description": desc}
    for k in keys:
        if k in art:
            out[k] = art[k]
    curve = out.get("nodes_vs_scans")
    if curve:
        out["nodes_vs_scans"] = curve[::4] + [curve[-1]]
    g = out.pop("tail_growth_nodes_per_scan", None)
    out["growth_nodes_per_scan"] = g
    out["plateaued"] = g is not None and abs(g) < 0.02
    return out

art = {
    "metric": "lifelong_warehouse_scans_per_sec",
    "workload": "40-lap serpentine warehouse, 19241 raw scans, "
                "1081-beam lidar, 1 TPU chip",
    "pipeline": "streaming_f32_chain_rasters",
    "round": 5,
    "variants": {
        "reference_decay": variant(
            ref, "exact reference objective only "
                 "(steady_state_min_candidates=0)"),
        "steady_state_decay": variant(
            dele, "steady-state bounding (trigger 20), delete-only "
                  "removal"),
        "steady_state_marginalized": variant(
            marg, "steady-state bounding (trigger 20) + "
                  "marginalize_on_removal (graph/marginal.py): removed "
                  "nodes' constraints Schur-composed onto neighbors"),
    },
    "note": (
        "Round-5 clean-host re-measurement (quiet 2-core host, load_1m "
        "recorded per variant; runs are DETERMINISTIC — the r4-code "
        "delete variant re-run bit-reproduces the round-5 number "
        "(survivors-ATE 3.5754 both), which also means the r4-published "
        "delete figure (1.69 m) did not come from the committed r4 "
        "snapshot; the marginalized figure reproduces (0.262 r4 vs "
        "0.275 now). Clutter experiment (VERDICT r4 next #5): adding "
        "distinctive off-lattice pillars to the warehouse "
        "(SLAM_WAREHOUSE_CLUTTER) made accuracy WORSE, not better — "
        "delete 3.55->4.08 m, marginalized 0.27->1.64 m survivors-ATE: "
        "at the loop matcher's 5 cm resolution the 0.24-0.64 m pillars "
        "mismatch between passes (approach-dependent occlusion of the "
        "long-range rack geometry), degrading exactly the closures "
        "they were meant to disambiguate; default is clutter-free. "
        "Online p50 is ~0.7-1.4 m across ALL variants while the "
        "marginalized map itself is accurate (survivors-ATE 0.275): "
        "the online column measures the between-correction odometry "
        "propagation lag plus episodic wrong-aisle excursions, not map "
        "quality — the engine-attributable residual is the 1-lap "
        "anchoring horizon that bounded decay imposes on closures "
        "(CLAUDE.md round-3 analysis), which marginalization mitigates "
        "in the MAP (3.55 -> 0.275) but cannot remove from the online "
        "pose between corrections."
    ),
}
with open("/root/repo/CONFIG3.json", "w") as f:
    json.dump(art, f, indent=1)
print("wrote CONFIG3.json")
for k, v in art["variants"].items():
    print(k, v["value_no_exclusions"], v.get("survivors_ate_m"),
          v.get("online_err_p50_m"), v.get("final_nodes"))
