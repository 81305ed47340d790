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
