"""`python -m tpu_splat` entry point (reference: src/main.cpp:13-48)."""

from .cli import main

raise SystemExit(main())
