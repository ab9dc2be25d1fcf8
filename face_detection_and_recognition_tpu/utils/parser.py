"""Shared CLI argument parser.

Same flag surface as the reference (``modules/utils/parser.py:37-62``):
``-i/--input_src``, ``--md/--model``, ``--dt/--det_thres`` (0.70),
``--at/--bbox_area_thres`` (0.12), ``-d/--device`` — with TPU-appropriate
device choices plus headless-output flags the reference lacks.
"""
from __future__ import annotations

import argparse
from typing import List


class ArgumentParserMod(argparse.ArgumentParser):
    """argparse with argument removal so entry points can edit the shared
    base parser (reference ``ArgumentParserMod``)."""

    def remove_argument(self, arg: str) -> None:
        for action in list(self._actions):
            opts = vars(action)["option_strings"]
            if (opts and opts[0] == arg) or vars(action)["dest"] == arg:
                self._remove_action(action)
        for group in self._action_groups:
            for ga in list(vars(group)["_group_actions"]):
                if ga.dest == arg:
                    vars(group)["_group_actions"].remove(ga)
                    return

    def remove_arguments(self, args: List[str]) -> None:
        for a in args:
            self.remove_argument(a)


def get_argparse(*args, **kwargs) -> ArgumentParserMod:
    parser = ArgumentParserMod(*args, **kwargs)
    parser.add_argument(
        "-i", "--input_src", default="0", dest="input_src",
        help=("Path to input image/video/cam_index:\n"
              "\t IMAGE_MODE       -i <PATH_TO_IMG>\n"
              "\t VIDEO_MODE       -i <PATH_TO_VID>\n"
              "\t CAM MODE:Default -i <CAM_INDEX>  -i 0 (for webcam)\n"))
    parser.add_argument(
        "--md", "--model", dest="model", default="yolov5s",
        help="Detector name from the registry or a checkpoint path. "
             "(default: %(default)s)")
    parser.add_argument(
        "--dt", "--det_thres", dest="det_thres", type=float, default=0.70,
        help="score to filter weak detections. (default: %(default)s)")
    parser.add_argument(
        "--at", "--bbox_area_thres", dest="bbox_area_thres", type=float,
        default=0.12,
        help="bbox_area * 100/image_area perc thres to filter small bboxes. "
             "(default: %(default)s)")
    parser.add_argument(
        "-d", "--device", dest="device", default="tpu",
        choices=["tpu", "cpu"],
        help="Device to inference on. (default: %(default)s)")
    parser.add_argument(
        "-o", "--output", dest="output", default=None,
        help="Write annotated image/video here instead of only displaying.")
    parser.add_argument(
        "--no-display", dest="no_display", action="store_true",
        help="Skip cv2.imshow (headless environments).")
    return parser
