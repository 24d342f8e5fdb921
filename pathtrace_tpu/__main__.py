from pathtrace_tpu.cli import main

raise SystemExit(main())
