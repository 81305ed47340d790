"""Reflectance filtering CLI — flag- and output-compatible rebuild of
/root/reference/filter_reflectance.py.

Same flags (--filename_in --guidance_in --path_out --sigma_color
--sigma_spatial --filter_type), same parameter semantics (bilateral:
d=-1/sigmaColor/sigmaSpace; guided: radius=int(sigma_spatial),
eps=sigma_color — filter_reflectance.py:49-73), same output naming
``{base}_{type}_c{sc}s{ss}.png`` (:92-93) and the same no-args help +
suggested parameter combos (:133-139).

Filtering happens in uint8 0-255 space exactly as the reference (it never
linearizes here, §3.2 of SURVEY.md); the kernels run on TPU.
"""
from __future__ import annotations

import argparse
import os
import sys

from ..ops.bilateral import joint_bilateral_filter_u8
from ..ops.guided import guided_filter_u8
from ..utils import image as iu


def apply_filter(filter_type, image, joint, sigma_color, sigma_spatial):
    """Apply the joint-bilateral or guided filter
    (filter_reflectance.py:49-73)."""
    if sigma_color <= 0 or sigma_spatial <= 0:
        raise ValueError("Parameters are expected to be positive.")
    if filter_type == "bilateral":
        return joint_bilateral_filter_u8(joint, image, d=-1,
                                         sigma_color=sigma_color,
                                         sigma_space=sigma_spatial)
    elif filter_type == "guided":
        return guided_filter_u8(joint, image, radius=int(sigma_spatial),
                                eps=sigma_color)
    raise ValueError("filter_type must be 'bilateral' or 'guided'.")


def read_filter_write(filter_type, filename_in, guidance_in,
                      sigma_color, sigma_spatial, path_out):
    """Read input + guidance, filter, write (filter_reflectance.py:76-96)."""
    basename = os.path.splitext(os.path.basename(filename_in))[0]
    image = iu.imread(filename_in)
    joint = iu.imread(guidance_in)

    filtered = apply_filter(filter_type, image, joint,
                            sigma_color, sigma_spatial)

    params = "_{}_c{}s{}".format(filter_type, sigma_color, sigma_spatial)
    filename = os.path.join(path_out, basename + params + ".png")
    iu.imwrite(filename, filtered)
    return filtered


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="""Filter reflectance prediction with a bilateral/guided
                       filter, to enhance piecewise constant reflectance
                       prior.""")
    parser.add_argument("--filename_in",
                        help="""Filename of the image which should be
                                filtered.""")
    parser.add_argument("--guidance_in",
                        help="""Filename of the guidance image which should be
                                used for filtering.""")
    parser.add_argument("--path_out",
                        help="""Where the resulting decompositions should be
                                saved.""")
    parser.add_argument("--sigma_color", type=float,
                        help="color parameter")
    parser.add_argument("--sigma_spatial", type=float,
                        help="spatial parameter")
    parser.add_argument("--filter_type",
                        help="""Which filter to choose,
                                the guided filter (guided) or
                                the joint bilateral filter (bilateral).""")
    args = parser.parse_args(argv)
    effective_argv = argv if argv is not None else sys.argv[1:]
    if len(effective_argv) > 0:
        read_filter_write(args.filter_type,
                          args.filename_in, args.guidance_in,
                          args.sigma_color, args.sigma_spatial,
                          args.path_out)
    else:
        parser.print_help()
        print("If you do not have any idea what parameters to choose, " +
              "try one of the following combinations:")
        print("--filter_type=bilateral --sigma_color=20 --sigma_spatial=22")
        print("--filter_type=guided --sigma_color=7 --sigma_spatial=52")
        print("--filter_type=guided --sigma_color=3 --sigma_spatial=45")


if __name__ == "__main__":
    main()
