"""Typed configuration collapsing the reference's three parameter tiers
(ROS params, Karto Parameter<T> registry, YAML files) into one dataclass.

Defaults follow Mapper::InitializeParameters
(/root/reference/lib/karto_sdk/src/Mapper.cpp:2088-2294) and the solver
defaults in /root/reference/solvers/ceres_solver.cpp:25-193.
"""
from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass, field


def _deg(d: float) -> float:
    return d * math.pi / 180.0


@dataclass(frozen=True)
class SolverConfig:
    """Pose-graph optimizer settings (ceres_solver.cpp:25-193 analog)."""

    max_iterations: int = 50          # LM outer iterations cap
    function_tolerance: float = 1e-3  # ceres_solver.cpp:157
    gradient_tolerance: float = 1e-6  # ceres_solver.cpp:158
    parameter_tolerance: float = 1e-3  # ceres_solver.cpp:159
    cg_max_iterations: int = 200      # inner PCG cap (TPU-native choice)
    cg_tolerance: float = 1e-8
    initial_lm_lambda: float = 1e-4
    use_double: bool = True           # solve in f64 on host-backed path
    dist_edge_threshold: int = 4096   # edges before the sharded solve kicks in
    # node count from which Compute() prefers the native host sparse
    # Cholesky (se2_solver.host_sparse_lm). 0 = always: on the tunneled
    # TPU the device solve pays ~25 ms dispatch/ack + ~25 ms fetch per
    # Compute and a multi-minute remote compile per (n,e) bucket, while
    # the host path solves n=925 in ~25 ms with zero tunnel traffic.
    # Raise past DENSE_MAX_NODES to prefer the on-device dense solve
    # (co-located TPU deployments).
    host_sparse_min_nodes: int = 0


@dataclass(frozen=True)
class MapperConfig:
    """All Mapper tunables with reference defaults (Mapper.cpp:2088-2294)."""

    # General (Mapper.cpp:2090-2204)
    use_scan_matching: bool = True
    use_scan_barycenter: bool = True
    minimum_time_interval: float = 3600.0
    minimum_travel_distance: float = 0.2
    minimum_travel_heading: float = _deg(10.0)
    scan_buffer_size: int = 70
    scan_buffer_maximum_scan_distance: float = 20.0
    link_match_minimum_response_fine: float = 0.8
    link_scan_maximum_distance: float = 10.0
    loop_search_maximum_distance: float = 4.0
    do_loop_closing: bool = True
    loop_match_minimum_chain_size: int = 10
    loop_match_maximum_variance_coarse: float = 0.4 ** 2
    loop_match_minimum_response_coarse: float = 0.8
    loop_match_minimum_response_fine: float = 0.8
    # Extensions beyond the reference gate set (both inf = exact
    # reference behavior; enabled by the LOCALIZATION preset — see
    # PoseGraph._loop_accept and PARITY.md §Known): a fine-match
    # response-surface variance ceiling, and a cap on how far an
    # accepted closure may displace the query from its current pose
    # (drift since the last correction is bounded in localization, so a
    # multi-meter jump is an aliased aisle/row, not a discovery)
    loop_match_maximum_variance_fine: float = float("inf")
    loop_closure_maximum_jump: float = float("inf")
    # Windowed elastic solve (ours; 0 = reference behavior = full-graph
    # solve per closure): when a closure fires, only nodes within this
    # radius (m) of the query move; the window boundary is held as fixed
    # anchors (PoseGraph.correct_poses / solver.compute_window). Against
    # a converged 100k-node prior the full solve costs seconds per
    # closure while moving the far field by ~nothing.
    localization_solve_radius: float = 0.0
    # Rate-limit streaming loop-closure attempts to one per this many
    # accepted scans (0 = attempt every drain, the default cadence).
    # Each attempt costs a candidate sweep + fused verify; localization
    # at small drains re-anchors far more often than drift warrants.
    loop_attempt_interval_scans: int = 0
    # Marginalize-on-removal (ours; False = reference delete-only
    # removal, Mapper.cpp:2964-3021): Schur-compose a removed node's
    # constraints onto its neighbors (graph/marginal.py) so lifelong
    # decay / buffer eviction bounds the graph without discarding the
    # information that anchored old geometry.
    marginalize_on_removal: bool = False

    # Sequential correlation grid (Mapper.cpp:2209-2225)
    correlation_search_space_dimension: float = 0.3
    correlation_search_space_resolution: float = 0.01
    correlation_search_space_smear_deviation: float = 0.03

    # Loop correlation grid (Mapper.cpp:2231-2245)
    loop_search_space_dimension: float = 8.0
    loop_search_space_resolution: float = 0.05
    loop_search_space_smear_deviation: float = 0.03

    # Scan matcher penalties / angular search (Mapper.cpp:2250-2293)
    distance_variance_penalty: float = 0.3 ** 2
    angle_variance_penalty: float = _deg(20.0) ** 2
    fine_search_angle_offset: float = _deg(0.2)
    coarse_search_angle_offset: float = _deg(20.0)
    coarse_angle_resolution: float = _deg(2.0)
    minimum_angle_penalty: float = 0.9
    minimum_distance_penalty: float = 0.5
    use_response_expansion: bool = False

    # Occupancy rendering (Karto.h:5920-5921)
    min_pass_through: int = 2
    occupancy_threshold: float = 0.1
    map_resolution: float = 0.05

    solver: SolverConfig = field(default_factory=SolverConfig)

    def replace(self, **kwargs) -> "MapperConfig":
        return dataclasses.replace(self, **kwargs)


# Canonical per-mode presets mirroring config/mapper_params_*.yaml
ONLINE_SYNC = MapperConfig(
    minimum_time_interval=0.5,
    minimum_travel_distance=0.5,
    minimum_travel_heading=0.5,
    scan_buffer_size=10,
    scan_buffer_maximum_scan_distance=10.0,
    loop_search_maximum_distance=3.0,
    loop_match_minimum_chain_size=10,
    loop_match_maximum_variance_coarse=3.0,
    loop_match_minimum_response_coarse=0.35,
    loop_match_minimum_response_fine=0.45,
    link_match_minimum_response_fine=0.1,
    link_scan_maximum_distance=1.5,
    correlation_search_space_dimension=0.5,
    correlation_search_space_resolution=0.01,
    correlation_search_space_smear_deviation=0.1,
    loop_search_space_dimension=8.0,
    loop_search_space_resolution=0.05,
    loop_search_space_smear_deviation=0.03,
    distance_variance_penalty=0.5,
    angle_variance_penalty=1.0,
    fine_search_angle_offset=0.00349,
    coarse_search_angle_offset=0.349,
    coarse_angle_resolution=0.0349,
    minimum_angle_penalty=0.9,
    minimum_distance_penalty=0.5,
    use_response_expansion=True,
)

LOCALIZATION = ONLINE_SYNC.replace(
    # mapper_params_localization.yaml:37,42 — a short elastic buffer and
    # a short chain requirement (the rolling window is only 3 scans)
    scan_buffer_size=3,
    loop_match_minimum_chain_size=3,
    minimum_travel_distance=0.5,
    # self-similarity defenses (ours): the reference coarse-variance
    # default (0.16, vs the yaml-preset 3.0) rejects multi-modal
    # response surfaces, the fine-variance ceiling enforces a unimodal
    # refinement, and the jump cap bounds corrections to plausible
    # inter-correction drift
    loop_match_maximum_variance_coarse=0.4 ** 2,
    loop_match_maximum_variance_fine=0.3 ** 2,
    loop_closure_maximum_jump=1.0,
    localization_solve_radius=20.0,
)

# mapper_params_online_async.yaml: mapper parameters are IDENTICAL to the
# sync preset — the async-ness is the queue policy (api.queue_modes
# AsyncPolicy), not a tuning change
ONLINE_ASYNC = ONLINE_SYNC

# mapper_params_offline.yaml: identical mapper parameters; the deltas are
# node-level (map_update_interval 10 s, a 4 h tf buffer) — see
# SessionPreset below
OFFLINE = ONLINE_SYNC

# mapper_params_lifelong.yaml:19-29 — sync mapper params + decay tuning
# (LifelongConfig lives in mapper/lifelong.py; the yaml overrides
# lifelong_node_removal_score from the code default 0.10 to 0.04)
LIFELONG = ONLINE_SYNC


@dataclass(frozen=True)
class SessionPreset:
    """Node-level knobs from config/mapper_params_*.yaml that live in the
    session layer (SlamSession / queue modes), not the Mapper — plus the
    mapper preset they pair with."""

    mapper: MapperConfig
    mode: str = "mapping"            # yaml `mode:` (mapping|localization)
    queue: str = "sync"              # sync|async node variant
    throttle_scans: int = 1
    map_update_interval: float = 5.0
    enable_interactive_mode: bool = True
    lifelong_node_removal_score: float | None = None

    def session_kwargs(self) -> dict:
        """kwargs for SlamSession(...)."""
        return {"throttle_scans": self.throttle_scans}


PRESETS = {
    "online_sync": SessionPreset(ONLINE_SYNC),
    "online_async": SessionPreset(ONLINE_ASYNC, queue="async"),
    "offline": SessionPreset(
        OFFLINE, map_update_interval=10.0, enable_interactive_mode=True
    ),
    "lifelong": SessionPreset(
        LIFELONG, enable_interactive_mode=False,
        lifelong_node_removal_score=0.04,
    ),
    "localization": SessionPreset(
        LOCALIZATION, mode="localization", enable_interactive_mode=False
    ),
}


def preset(name: str) -> SessionPreset:
    """Look up a mapper_params_<name>.yaml-equivalent preset."""
    try:
        return PRESETS[name]
    except KeyError:
        raise KeyError(
            f"unknown preset {name!r}; choose from {sorted(PRESETS)}"
        ) from None
