"""Driver-facing entry points stay importable and structurally sound."""

import importlib
import sys


def test_graft_entry_importable_and_shaped():
    g = importlib.import_module("__graft_entry__")
    assert callable(g.entry) and callable(g.dryrun_multichip)


def test_bench_cli_parses():
    import bench

    sys.argv = ["bench.py", "--help"]
    try:
        bench.main()
    except SystemExit as e:  # --help exits 0
        assert e.code == 0


def test_export_cli_parses():
    import export_aot

    sys.argv = ["export_aot.py", "--help"]
    try:
        export_aot.parse_args()
    except SystemExit as e:
        assert e.code == 0
