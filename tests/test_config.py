"""Config/CLI machinery: flag surface, cfg_args roundtrip, merge semantics."""

import sys
from argparse import ArgumentParser

import pytest

from gsjax.config import (
    ModelParams,
    OptimizationParams,
    PipelineParams,
    dump_cfg_args,
    get_combined_args,
)


def test_flag_surface_matches_reference_defaults():
    """The headline defaults the recipes rely on (arguments/__init__.py)."""
    o = OptimizationParams._defaults()
    assert o["iterations"] == 30_000
    assert o["lambda_dssim"] == 0.2
    assert o["lambda_multi_view_ncc"] == 0.6
    assert o["multi_view_patch_size"] == 3
    assert o["densify_until_iter"] == 15_000
    m = ModelParams._defaults()
    assert m["sh_degree"] == 3 and m["sg_degree"] == 0
    assert m["resolution"] == -1
    assert "debug" in PipelineParams._defaults()


def test_cfg_args_roundtrip_and_merge(tmp_path, monkeypatch):
    """dump_cfg_args -> get_combined_args without eval(): saved values fill
    unset flags, explicit CLI flags win (arguments/__init__.py:125-145)."""
    from argparse import Namespace

    model_path = str(tmp_path)
    saved = Namespace(model_path=model_path, sh_degree=2, sg_degree=7,
                      source_path="/data/scan24", resolution=2,
                      white_background=True, kernel_size=0.1,
                      images="images_2")
    dump_cfg_args(model_path, saved)

    parser = ArgumentParser()
    ModelParams(parser, sentinel=True)
    parser.add_argument("--iteration", type=int, default=-1)
    monkeypatch.setattr(sys, "argv",
                        ["render.py", "-m", model_path, "--sh_degree", "1"])
    args = get_combined_args(parser)
    assert args.sh_degree == 1                 # CLI beats cfg_args
    assert args.sg_degree == 7                 # cfg_args fills sentinel
    assert args.source_path == "/data/scan24"
    assert args.white_background is True
    assert args.kernel_size == pytest.approx(0.1)
    assert args.images == "images_2"


def test_cfg_args_rejects_code(tmp_path, monkeypatch):
    """A malicious cfg_args must not execute (the reference eval()s it)."""
    with open(tmp_path / "cfg_args", "w") as f:
        f.write("Namespace(source_path=__import__('os').getcwd())")
    parser = ArgumentParser()
    ModelParams(parser, sentinel=True)
    monkeypatch.setattr(sys, "argv", ["render.py", "-m", str(tmp_path)])
    args = get_combined_args(parser)
    # the AST literal parse refuses the call expression; flag stays unset
    assert getattr(args, "source_path", None) in (None, "")
