"""`python -m moonrtx_tpu` runs the CLI (reference: `python -m moonrtx.main`,
README.md:16-31). The GUI launcher stays at `python -m moonrtx_tpu.app.launcher`."""

from moonrtx_tpu.app.cli import main

if __name__ == "__main__":
    main()
