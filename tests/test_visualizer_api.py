"""PCLVisualizer-parity API surface (visualization/visualizer.py):
actor registry, rendering properties, handler registry, event dispatch,
HTML render with embedded event capture."""

import json
import numpy as np
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud
from pcl_tpu.visualization import (Visualizer, KeyboardEvent,
                                   PointPickingEvent)


def _cloud(n=100, seed=0):
    rng = np.random.default_rng(seed)
    return Cloud(xyz=jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
                 mask=jnp.ones((n,), bool))


class TestActorRegistry:
    def test_add_update_remove(self):
        v = Visualizer()
        assert v.add_point_cloud(_cloud(), "a")
        assert not v.add_point_cloud(_cloud(), "a")     # duplicate id
        assert v.update_point_cloud(_cloud(50), "a")
        assert not v.update_point_cloud(_cloud(), "missing")
        assert v.contains("a")
        assert v.remove_point_cloud("a")
        assert not v.remove_point_cloud("a")

    def test_rendering_properties(self):
        v = Visualizer()
        v.add_point_cloud(_cloud(), "a")
        assert v.set_point_cloud_rendering_properties("point_size", 5, "a")
        assert v.set_point_cloud_rendering_properties("color", (1, 0, 0), "a")
        assert not v.set_point_cloud_rendering_properties("point_size", 5, "x")

    def test_shapes_and_axes(self):
        v = Visualizer()
        assert v.add_sphere([0, 0, 0], 1.0, "s")
        assert v.add_line([0, 0, 0], [1, 1, 1], "l")
        assert v.add_cube([0, 0, 0], [1, 1, 1], "c")
        assert v.add_text3d("hello", [0, 0, 1], "t")
        v.add_coordinate_system(0.5)
        assert v.contains("_axis_x")
        assert v.remove_shape("s") and not v.remove_shape("s")


class TestCallbacks:
    def test_keyboard_and_pick_dispatch(self):
        v = Visualizer()
        keys, picks = [], []
        un_kb = v.register_keyboard_callback(lambda e: keys.append(e))
        v.register_point_picking_callback(lambda e: picks.append(e))
        n = v.dispatch_events([
            {"type": "key", "key": "r", "down": True},
            {"type": "pick", "index": 7, "x": 1.0, "y": 2.0, "z": 3.0},
            {"type": "mouse", "event": "press", "button": "left",
             "x": 10, "y": 20},
        ])
        assert n == 3
        assert keys[0].get_key_sym() == "r" and not keys[0].key_up()
        assert picks[0].get_point_index() == 7
        assert picks[0].get_point() == (1.0, 2.0, 3.0)
        # q stops the interactor like the reference window
        assert not v.was_stopped()
        v.dispatch_events([{"type": "key", "key": "q"}])
        assert v.was_stopped()
        # unregister works
        un_kb()
        v.dispatch_events([{"type": "key", "key": "z"}])
        assert len(keys) == 2      # only the 'q' arrived after 'r'

    def test_dispatch_from_json_file(self, tmp_path):
        v = Visualizer()
        got = []
        v.register_keyboard_callback(lambda e: got.append(e.key_sym))
        p = tmp_path / "ev.json"
        p.write_text(json.dumps([{"type": "key", "key": "a"},
                                 {"type": "key", "key": "b"}]))
        assert v.dispatch_events(str(p)) == 2
        assert got == ["a", "b"]


class TestRender:
    def test_spin_once_html_with_event_capture(self, tmp_path):
        v = Visualizer("demo")
        v.add_point_cloud(_cloud(200), "a")
        v.set_point_cloud_rendering_properties("color", (0.2, 0.9, 0.2), "a")
        v.add_sphere([0, 0, 0], 0.5, "s", color=(1, 0, 0))
        out = v.spin_once(str(tmp_path / "view.html"))
        html = open(out).read()
        assert "pcl_tpu event capture" in html          # callbacks wired
        assert "dblclick" in html                       # point picking
        assert "keydown" in html
        assert "demo" in html

    def test_ascii_snapshot(self, tmp_path):
        v = Visualizer()
        v.add_point_cloud(_cloud(500), "a")
        s = v.spin_once(None)
        assert isinstance(s, str) and len(s) > 100
        v.save_screenshot(str(tmp_path / "shot.txt"))
        assert (tmp_path / "shot.txt").read_text() == s
