"""Interactive preview mode.

The reference uses `ti.GUI` (render.py:4156-4353): spherical-orbit mouse
camera, FOV keys, toggles for differentials/bloom/flare, solo-component
debug keys, live lifecycle advance, FPS HUD. TPU hosts are headless, so
this module provides:

  * a matplotlib-backed interactive window when a display is available,
    with the same key bindings (d/b/l toggles, arrows for FOV, +/- zoom,
    1-8/0 solo components, s screenshot, q quit);
  * a headless fallback that renders a short animated preview sequence
    (lifecycle advancing + slow orbit) to PNG frames.
"""

from __future__ import annotations

import os
import time

import numpy as np

from .config import SceneConfig
from .utils.io import save_image

_SOLO_KEYS = {
    "1": 0, "2": 1, "3": 3, "4": 11, "5": 12, "6": 5, "7": 9, "8": 7,
}
_SOLO_NAMES = {
    0: "temp_base", 1: "spiral", 3: "turbulence", 5: "filaments",
    7: "rt_spikes", 9: "hotspot", 11: "az_hotspot", 12: "disturb_mod",
}


def _build(config: SceneConfig):
    # One renderer-construction path for every mode (modes._make_renderer
    # handles the V2 branch and lifecycle sizing). r_escape_quantum:
    # zoom ('+'/'-') changes the camera distance a few percent per
    # keypress; quantizing r_escape keeps the trace program stable
    # across zoom steps instead of recompiling per keypress.
    from .modes import _make_renderer

    return _make_renderer(config, r_escape_quantum=4.0)


# Non-GUI matplotlib backends: selecting one "succeeds" headlessly, so
# it must route to the headless preview, not an invisible event loop.
_HEADLESS_BACKENDS = {"agg", "pdf", "pgf", "ps", "svg", "template", "cairo"}


def run_interactive(config: SceneConfig) -> None:
    """Dispatch to windowed or headless preview."""
    env_backend = os.environ.get("MPLBACKEND", "").lower()
    if env_backend in _HEADLESS_BACKENDS:
        run_headless_preview(config)
        return
    if os.environ.get("DISPLAY") or env_backend:
        # Only backend/window creation falls back to the headless
        # preview; an error raised later from the render loop itself
        # must propagate with its traceback, not trigger a minutes-long
        # preview render that masks it.
        try:
            window = _open_window(config)
        except Exception as exc:  # no usable backend
            print(f"Interactive window unavailable ({exc}); "
                  "falling back to headless preview")
        else:
            _run_matplotlib(config, window)
            return
    run_headless_preview(config)


def run_headless_preview(config: SceneConfig, n_frames: int = 24,
                         out_dir: str = "output/preview") -> None:
    """Render a short lifecycle+orbit preview sequence to PNG frames."""
    renderer, dynamic = _build(config)
    os.makedirs(out_dir, exist_ok=True)
    cam = np.asarray(config.pov, dtype=np.float64)
    radius = float(np.linalg.norm(cam))
    base_angle = float(np.arctan2(cam[1], cam[0]))
    dt = config.disk_rotation_speed * 2.0

    speed = max(config.disk_rotation_speed, 1e-9)
    for i in range(n_frames):
        t = i * dt
        angle = base_angle + np.radians(i * 1.5)
        pos = [radius * np.cos(angle), radius * np.sin(angle), cam[2]]
        if dynamic is not None:
            tex = dynamic.advance(t, dt, recompute_stats=(i % 60 == 0))
            renderer.update_disk_texture(tex)
            frame = 0  # rotation lives in the advancing texture
        else:
            frame = t / speed  # V2: rotation via the sampler's t_offset
        img = renderer.render(
            pos, config.fov, frame=frame, skip_differentials=True
        )
        save_image(img, os.path.join(out_dir, f"preview_{i:03d}.png"))
    print(f"Headless preview: {n_frames} frames in {out_dir}/")


def _open_window(config: SceneConfig):
    """Select a GUI backend and create the window — the only part whose
    failure should fall back to the headless preview."""
    import matplotlib

    matplotlib.use(os.environ.get("MPLBACKEND", "TkAgg"))
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 6))
    return plt, fig, ax


def _run_matplotlib(config: SceneConfig, window) -> None:
    """Matplotlib interactive loop with reference-equivalent controls."""
    plt, fig, ax = window
    renderer, dynamic = _build(config)
    cam = np.asarray(config.pov, dtype=np.float64)
    state = {
        "r": float(np.linalg.norm(cam)),
        "theta": float(np.arccos(np.clip(cam[2] / np.linalg.norm(cam), -1, 1))),
        "phi": float(np.arctan2(cam[1], cam[0])),
        "fov": config.fov,
        # 'd' toggles the differential+mip-LOD path live (inert for V2,
        # which has no LOD path); start from the launch config.
        "diff": config.use_ray_differentials,
        "bloom": True,
        "flare": False,
        "solo": -1,
        "running": True,
        "drag": None,
    }

    ax.axis("off")
    im = ax.imshow(np.zeros((*config.image_size[::-1], 3)))
    hud = ax.text(0.01, 0.97, "", transform=ax.transAxes, color="w",
                  fontsize=8, va="top")

    def cam_pos():
        r, th, ph = state["r"], state["theta"], state["phi"]
        return [r * np.sin(th) * np.cos(ph), r * np.sin(th) * np.sin(ph),
                r * np.cos(th)]

    def on_key(event):
        k = event.key
        if k in ("q", "escape"):
            state["running"] = False
        elif k == "d":
            state["diff"] = not state["diff"]
        elif k == "b":
            state["bloom"] = not state["bloom"]
        elif k == "l":
            state["flare"] = not state["flare"]
        elif k == "up":
            state["fov"] = max(10.0, state["fov"] - 5.0)
        elif k == "down":
            state["fov"] = min(170.0, state["fov"] + 5.0)
        elif k in ("+", "="):
            state["r"] = max(2.0, state["r"] * 0.97)
        elif k == "-":
            state["r"] *= 1.03
        elif k == "0":
            state["solo"] = -1
        elif k in _SOLO_KEYS:
            state["solo"] = _SOLO_KEYS[k]
        elif k == "s":
            path = f"output/screenshot_{int(time.time())}.png"
            save_image(np.asarray(im.get_array()), path)
            print(f"Screenshot: {path}")

    def on_press(event):
        state["drag"] = (event.x, event.y)

    def on_release(event):
        state["drag"] = None

    def on_motion(event):
        if state["drag"] is None or event.x is None:
            return
        dx = (event.x - state["drag"][0]) / 200.0
        dy = (event.y - state["drag"][1]) / 200.0
        state["phi"] -= dx
        state["theta"] = np.clip(state["theta"] - dy, 0.05, np.pi - 0.05)
        state["drag"] = (event.x, event.y)

    fig.canvas.mpl_connect("key_press_event", on_key)
    fig.canvas.mpl_connect("button_press_event", on_press)
    fig.canvas.mpl_connect("button_release_event", on_release)
    fig.canvas.mpl_connect("motion_notify_event", on_motion)
    plt.ion()
    plt.show()

    wall_time = 0.0
    frames = 0
    last = time.time()
    fps = 0.0
    while state["running"] and plt.fignum_exists(fig.number):
        now = time.time()
        real_dt = now - last  # actual frame time (drives the FPS HUD)
        dt = min(real_dt, 0.1)  # clamped sim step (no jumps after stalls)
        last = now
        scaled_dt = dt * config.disk_rotation_speed * 20.0
        wall_time += scaled_dt
        frames += 1

        if dynamic is not None:
            tex = dynamic.advance(
                wall_time, scaled_dt,
                recompute_stats=(frames % 60 == 1),
                solo_idx=state["solo"],
            )
            renderer.update_disk_texture(tex)
            render_frame = 0  # rotation lives in the advancing texture
        else:
            # V2 volume disk: rotation via the sampler's t_offset.
            render_frame = wall_time / max(
                config.disk_rotation_speed, 1e-9
            )
        img = renderer.render(
            cam_pos(), state["fov"], frame=render_frame,
            skip_differentials=not state["diff"],
            force_differentials=state["diff"],
            skip_bloom=not state["bloom"],
            lens_flare=state["flare"],
        )
        im.set_data(img)
        fps = 0.9 * fps + 0.1 * (1.0 / max(real_dt, 1e-3))
        solo_txt = (f" SOLO:{_SOLO_NAMES.get(state['solo'], state['solo'])}"
                    if state["solo"] >= 0 else "")
        d_txt = ("n/a" if config.disk_model == "v2"
                 else ("ON" if state["diff"] else "off"))
        hud.set_text(
            f"{fps:.0f} FPS | D:{d_txt} "
            f"B:{'ON' if state['bloom'] else 'off'} "
            f"L:{'ON' if state['flare'] else 'off'} | "
            f"E:{dynamic.entity_count if dynamic is not None else 0}"
            f"{solo_txt}\n"
            f"r={state['r']:.1f} fov={state['fov']:.0f} t={wall_time:.1f}"
        )
        fig.canvas.draw_idle()
        plt.pause(0.001)
