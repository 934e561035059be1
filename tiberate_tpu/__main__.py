from tiberate_tpu._cli import main

raise SystemExit(main())
