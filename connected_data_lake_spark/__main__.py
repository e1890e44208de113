"""``python -m connected_data_lake_spark`` → the cdl-spark CLI."""

import sys

from connected_data_lake_spark.cli import main

sys.exit(main())
