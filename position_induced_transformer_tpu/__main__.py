from position_induced_transformer_tpu.cli import main

raise SystemExit(main())
