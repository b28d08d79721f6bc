from tpustereo.cli.main import main

raise SystemExit(main())
