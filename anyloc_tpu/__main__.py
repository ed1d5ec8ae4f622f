from anyloc_tpu.cli import main

raise SystemExit(main())
