"""Visualization utils (api/viz.py) — marker export + map rendering.

Reference parity target: visualization_utils.hpp toMarker (per-node
sphere markers, :34-60) and the assistant's interactive-mode gate.
"""
import numpy as np

from slam_toolbox_tpu.api import SlamSession
from slam_toolbox_tpu.api.viz import graph_to_markers, render_map
from slam_toolbox_tpu.core.params import MapperConfig
from slam_toolbox_tpu.core.scan import LaserConfig
from slam_toolbox_tpu.io.dataset import LidarSimulator, SegmentWorld
import pytest

# heavyweight end-to-end module: excluded from the fast subset
# (python -m pytest -m 'not slow'); CI runs everything
pytestmark = pytest.mark.slow


def _small_session():
    laser = LaserConfig(
        min_range=0.05, max_range=12.0, range_threshold=10.0,
        angular_resolution=np.deg2rad(1.0),
    )
    world = SegmentWorld.rooms(16.0, 10.0)
    sim = LidarSimulator(world, laser, range_noise=0.005,
                         odom_noise=(0.01, 0.004), seed=7)
    # known-good loop through the 16x10 rooms world (same as bench.py)
    lap = [
        (-6.0, -3.5), (1.5, -3.5), (5.5, -3.5), (5.5, 0.5), (5.5, 3.5),
        (1.0, 3.5), (-3.0, 3.5), (-6.0, 3.0), (-6.5, -1.0),
    ]
    data = sim.simulate(np.array(lap * 2 + [lap[0]]), step=0.4)
    cfg = MapperConfig(minimum_travel_distance=0.3,
                       minimum_time_interval=0.0)
    sess = SlamSession(cfg, laser)
    for i, (scan, _tp) in enumerate(data):
        sess.process_scan(scan.ranges, scan.odom_pose, time=i * 0.1)
    return sess


def test_markers_and_render(tmp_path):
    sess = _small_session()
    markers = graph_to_markers(sess, interactive=True)
    nodes, edges = sess.get_graph()
    assert len(markers) == len(nodes) > 5
    m = markers[0]
    assert set(m) == {"id", "x", "y", "scale", "interactive",
                      "localization"}
    assert m["interactive"] is True
    assert m["scale"] == 0.1  # reference default, toMarker :50
    # mapping mode: nothing is in the elastic buffer
    assert not any(mk["localization"] for mk in markers)

    out = str(tmp_path / "map.ppm")
    img = render_map(sess, path=out)
    assert img.ndim == 3 and img.shape[2] == 3
    # the overlay actually drew: nodes (red) + trajectory (orange);
    # sequential edges (blue) lie under the trajectory so only closures
    # (green) are guaranteed visible when one fired — require any edge ink
    for col in ([220, 60, 60], [240, 160, 40]):
        assert np.any(np.all(img == np.array(col, np.uint8), axis=-1)), col
    # edge ink: check a trajectory-free render so sequential (blue) edges
    # can't be exactly overdrawn by the orange path — the assertion must
    # not depend on whether a loop closure happened to fire
    img_e = render_map(sess, with_trajectory=False)
    edge_ink = (
        np.any(np.all(img_e == np.array([80, 140, 220], np.uint8), axis=-1))
        or np.any(np.all(img_e == np.array([60, 180, 90], np.uint8),
                         axis=-1))
    )
    assert edge_ink or len(edges) == 0
    # PPM header + payload size
    with open(out, "rb") as f:
        head = f.readline()
        dims = f.readline().split()
        f.readline()
        payload = f.read()
    assert head.strip() == b"P6"
    w, h = int(dims[0]), int(dims[1])
    assert (h, w) == img.shape[:2]
    assert len(payload) == h * w * 3

    # marker export respects the interactive-mode visualization pause
    sess.toggle_interactive_mode()
    assert graph_to_markers(sess) == []
    sess.toggle_interactive_mode()

    # localization-buffer vertices are tagged distinctly
    # (loop_closure_assistant.cpp:157-273 coloring)
    sess.toggle_mode("localization")
    laser = sess.laser
    world = SegmentWorld.rooms(16.0, 10.0)
    sim = LidarSimulator(world, laser, range_noise=0.005,
                         odom_noise=(0.01, 0.004), seed=8)
    lap = [(-6.0, -3.5), (-4.0, -3.5), (-2.0, -3.5), (0.0, -3.5)]
    data = sim.simulate(np.array(lap), step=0.4)
    for i, (scan, _tp) in enumerate(data):
        sess.process_scan(scan.ranges, scan.odom_pose, time=1e4 + i * 0.1)
    sess.flush()
    assert len(sess.mapper.localization_buffer) > 0
    markers = graph_to_markers(sess)
    tagged = {mk["id"] for mk in markers if mk["localization"]}
    assert tagged == sess.localization_buffer_uids()
    assert len(tagged) > 0
