from hbacker_spark.cli import main

raise SystemExit(main())
