"""Regenerate the golden brightness pins in tests/test_render.py.

Run on CPU:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python tests/golden/regen.py
"""
import numpy as np

import cg_raytracer_tpu as cgrt


def main():
    cfg = cgrt.RenderConfig(width=32, height=32)
    cam = cgrt.Camera.default()
    for name in ["single_triangle", "cube", "cornell_box", "monkey", "spheres",
                 "teacup", "donut"]:
        img = np.asarray(cgrt.render(cgrt.load_scene(name), cam, cfg))
        print(f'    "{name}": {float(img.mean()):.6f},')


if __name__ == "__main__":
    main()
