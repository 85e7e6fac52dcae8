from lexmapr_ray.cli import main

raise SystemExit(main())
