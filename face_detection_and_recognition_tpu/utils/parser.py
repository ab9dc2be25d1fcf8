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
    base parser (same capability as the reference's ``ArgumentParserMod``,
    implemented independently)."""

    def remove_argument(self, arg: str) -> None:
        """Drop the flag whose dest (or primary option string) is ``arg``
        from this parser and from every action group that displays it."""
        doomed = [
            a for a in self._actions
            if a.dest == arg or (a.option_strings and a.option_strings[0] == arg)
        ]
        for action in doomed:
            self._remove_action(action)
            for group in self._action_groups:
                if action in group._group_actions:
                    group._group_actions.remove(action)
            # _remove_action drops the action from help/parsing order but
            # argparse ROUTES option strings through _option_string_actions;
            # without this the removed flag still parses and re-adding it
            # conflicts
            for opt in action.option_strings:
                self._option_string_actions.pop(opt, None)

    def remove_arguments(self, args: List[str]) -> None:
        for a in args:
            self.remove_argument(a)


def get_argparse(*args, **kwargs) -> ArgumentParserMod:
    parser = ArgumentParserMod(*args, **kwargs)
    parser.add_argument(
        "-i", "--input_src", default="0", dest="input_src",
        help="Media source: an image path, a video path, or a webcam index "
             "(e.g. -i 0 opens the default camera). (default: %(default)s)")
    parser.add_argument(
        "--md", "--model", dest="model", default="yolov5s",
        help="Detector name from the registry or a checkpoint path. "
             "(default: %(default)s)")
    parser.add_argument(
        "--dt", "--det_thres", dest="det_thres", type=float, default=0.70,
        help="Minimum detection confidence; boxes at or below this score "
             "are dropped. (default: %(default)s)")
    parser.add_argument(
        "--at", "--bbox_area_thres", dest="bbox_area_thres", type=float,
        default=0.12,
        help="Minimum box size as a percentage of the frame area "
             "(100*box/frame); smaller boxes are dropped. "
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
