"""Strong/weak-order convergence check: stratonovich_general
(thin wrapper over diagnostics.run_all; reference has one script per
sde_type x noise_type combination, /root/reference/diagnostics/stratonovich_general.py)."""

from . import run_all


def main():
    import sys
    sys.argv = [sys.argv[0]] + sys.argv[1:] + ["--only", "stratonovich_general"]
    run_all.main()


if __name__ == "__main__":
    main()
