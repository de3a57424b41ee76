"""`python -m cutrace_tpu <scene.json>` — see cutrace_tpu.cli."""

import sys

from cutrace_tpu.cli import main

sys.exit(main())
