import sys

from rmi_tpu.cli import main

sys.exit(main())
