"""Config #1: wireframe Suzanne, headless PNG out (parity: hello_wireframe.cpp)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from lsr_tpu.io.obj import load_obj
from lsr_tpu.io.png import save_canvas_png
from lsr_tpu.utils.host import fetch_image
from lsr_tpu.raster.wireframe import render_wireframe

MONKEY = "/root/reference/cpp-folders/src/assets/obj/monkey/monkey.rawobj"


def main():
    w = h = 600
    mesh = load_obj(MONKEY)
    canvas = fetch_image(render_wireframe(mesh, w, h))
    out = os.path.join(os.path.dirname(__file__), "..", "out")
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, "hello_wireframe.png")
    save_canvas_png(path, canvas)
    print(f"wrote {path}  ({(canvas.any(axis=-1)).sum()} lit pixels)")


if __name__ == "__main__":
    main()
