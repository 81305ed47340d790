"""End-to-end tests of the filter CLI (reference filter_reflectance.py parity)."""
import os

import numpy as np
import pytest

from reflectance_filtering_tpu.cli.filter import (
    apply_filter, read_filter_write, main)


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    import cv2
    rng = np.random.RandomState(3)
    d = tmp_path_factory.mktemp("filter_imgs")
    img = (rng.rand(48, 56, 3) * 255).astype(np.uint8)
    guide = (rng.rand(48, 56, 3) * 255).astype(np.uint8)
    p_img = str(d / "refl.png")
    p_guide = str(d / "guide.png")
    cv2.imwrite(p_img, img)
    cv2.imwrite(p_guide, guide)
    return p_img, p_guide, img, guide


def test_validates_positive_sigmas(images):
    _, _, img, guide = images
    with pytest.raises(ValueError):
        apply_filter("bilateral", img, guide, 0, 22)
    with pytest.raises(ValueError):
        apply_filter("guided", img, guide, 3, -1)
    with pytest.raises(ValueError):
        apply_filter("mystery", img, guide, 3, 4)


def test_output_naming_bilateral(images, tmp_path):
    p_img, p_guide, _, _ = images
    read_filter_write("bilateral", p_img, p_guide, 20.0, 3.0, str(tmp_path))
    assert os.path.isfile(str(tmp_path / "refl_bilateral_c20.0s3.0.png"))


def test_output_naming_guided(images, tmp_path):
    p_img, p_guide, _, _ = images
    read_filter_write("guided", p_img, p_guide, 3.0, 8.0, str(tmp_path))
    assert os.path.isfile(str(tmp_path / "refl_guided_c3.0s8.0.png"))


def test_written_bytes_match_filter_output(images, tmp_path):
    import cv2
    p_img, p_guide, img, guide = images
    filtered = read_filter_write("guided", p_img, p_guide, 3.0, 8.0,
                                 str(tmp_path))
    back = cv2.imread(str(tmp_path / "refl_guided_c3.0s8.0.png"))
    np.testing.assert_array_equal(back, filtered)  # uint8 written verbatim


def test_cli_main(images, tmp_path):
    p_img, p_guide, _, _ = images
    main(["--filter_type=bilateral", "--sigma_color=15", "--sigma_spatial=2",
          "--filename_in", p_img, "--guidance_in", p_guide,
          "--path_out", str(tmp_path)])
    assert os.path.isfile(str(tmp_path / "refl_bilateral_c15.0s2.0.png"))


def test_cli_no_args_prints_help(capsys):
    main([])
    out = capsys.readouterr().out
    assert "--filter_type=bilateral --sigma_color=20 --sigma_spatial=22" in out


@pytest.fixture(scope="module")
def smooth_images(tmp_path_factory):
    """Natural-ish smooth images — the approximate fast modes' accuracy
    claims hold on piecewise-smooth content, not white noise (where a
    coarse grid/subsample necessarily diverges from per-pixel taps)."""
    import cv2
    rng = np.random.RandomState(9)
    d = tmp_path_factory.mktemp("filter_smooth")
    yy, xx = np.mgrid[0:48, 0:56].astype(np.float32)
    img = np.clip(np.stack([120 + 60 * np.sin(xx / 9.0),
                            100 + 50 * np.cos(yy / 7.0),
                            90 + 40 * np.sin((xx + yy) / 11.0)], -1)
                  + 8 * rng.rand(48, 56, 3), 0, 255).astype(np.uint8)
    guide = np.clip(img.astype(np.float32) * 0.8 + 20
                    + 5 * rng.rand(48, 56, 3), 0, 255).astype(np.uint8)
    p_img = str(d / "refl.png")
    p_guide = str(d / "guide.png")
    cv2.imwrite(p_img, img)
    cv2.imwrite(p_guide, guide)
    return p_img, p_guide, img, guide


def test_cli_bilateral_grid_fast_mode(smooth_images, tmp_path, capsys):
    """Opt-in approximate grid bilateral: distinct output name, quality
    caveat printed, result within a few uint8 levels of the exact
    filter (VERDICT r2 item 4 — the fast modes must be reachable from
    the CLI surface)."""
    p_img, p_guide, img, guide = smooth_images
    main(["--filter_type=bilateral_grid", "--sigma_color=20",
          "--sigma_spatial=6", "--filename_in", p_img,
          "--guidance_in", p_guide, "--path_out", str(tmp_path)])
    err = capsys.readouterr().err
    assert "APPROXIMATE" in err
    import cv2
    got = cv2.imread(str(tmp_path / "refl_bilateral_grid_c20.0s6.0.png"))
    exact = apply_filter("bilateral", img, guide, 20.0, 6.0)
    assert np.abs(got.astype(float) - exact.astype(float)).mean() < 3.0


def test_cli_guided_subsample_fast_mode(smooth_images, tmp_path, capsys):
    """Opt-in Fast Guided Filter: --subsample>1 on guided, distinct
    output name, caveat printed, close to the exact filter."""
    p_img, p_guide, img, guide = smooth_images
    main(["--filter_type=guided", "--sigma_color=9", "--sigma_spatial=8",
          "--subsample=2", "--filename_in", p_img,
          "--guidance_in", p_guide, "--path_out", str(tmp_path)])
    err = capsys.readouterr().err
    assert "Fast Guided Filter" in err
    import cv2
    got = cv2.imread(str(tmp_path / "refl_guided_sub2_c9.0s8.0.png"))
    exact = apply_filter("guided", img, guide, 9.0, 8.0)
    assert np.abs(got.astype(float) - exact.astype(float)).mean() < 3.0
    # subsample=1 must remain byte-identical to the parity path
    same = apply_filter("guided", img, guide, 9.0, 8.0, subsample=1)
    np.testing.assert_array_equal(same, exact)


def test_missing_sigmas_raise_value_error():
    """Omitted sigma flags (argparse default None) must hit the same
    ValueError as non-positive ones, not a TypeError on None <= 0."""
    import numpy as np
    import pytest
    from reflectance_filtering_tpu.cli.filter import apply_filter

    img = np.zeros((8, 8, 3), np.uint8)
    for sc, ss in ((None, 22.0), (20.0, None), (None, None)):
        with pytest.raises(ValueError, match="positive"):
            apply_filter("bilateral", img, img, sc, ss)
