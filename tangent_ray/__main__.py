from tangent_ray.cli import main

raise SystemExit(main())
