from parallel_louvain_method_ray.cli import main

raise SystemExit(main())
