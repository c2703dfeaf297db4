import sys

from qmann_tpu.cli import main

sys.exit(main())
