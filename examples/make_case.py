"""Generate the example offline case: domain, init, and hourly forcing
files (the reference repo references NetCDF inputs it does not ship;
this produces an equivalent self-contained case)."""

import datetime
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def main(n=16, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(HERE, "ldasin"), exist_ok=True)

    lat = np.deg2rad(rng.uniform(30.0, 45.0, n)).astype(np.float32)
    np.savez(os.path.join(HERE, "domain.npz"),
             lat=lat,
             lon=np.deg2rad(rng.uniform(-110, -80, n)).astype(np.float32),
             lutyp=rng.choice([2, 5, 7, 8, 11, 14], n).astype(np.int32),
             sltyp=rng.choice([3, 4, 6, 8, 9], n).astype(np.int32),
             slptyp=np.ones(n, np.int32),
             isc=rng.integers(1, 9, n).astype(np.int32),
             ist=np.ones(n, np.int32),
             ice=np.zeros(n, np.int32),
             shdfac=rng.uniform(0.3, 0.9, n).astype(np.float32),
             shdmax=rng.uniform(0.6, 0.95, n).astype(np.float32),
             tbot=np.full(n, 285.0, np.float32),
             zlvl=np.full(n, 10.0, np.float32),
             zsoil=np.array([-0.1, -0.4, -1.0, -2.0], np.float32))

    np.savez(os.path.join(HERE, "init.npz"),
             tg=np.full(n, 283.0, np.float32),
             tv=np.full(n, 283.0, np.float32),
             swc=np.full((n, 4), 0.28, np.float32),
             smc=np.full((n, 4), 0.28, np.float32))

    # hourly forcing for the day + one extra hour for interpolation
    t0 = datetime.datetime(2000, 1, 1)
    for h in range(26):
        when = t0 + datetime.timedelta(hours=h)
        tod = h % 24
        day = max(0.0, np.sin((tod - 6) / 12 * np.pi))
        np.savez(os.path.join(HERE, "ldasin",
                              when.strftime("%Y%m%d%H") + ".npz"),
                 sfctmp=np.full(n, 278.0 + 8.0 * day, np.float32),
                 sfcprs=np.full(n, 95000.0, np.float32),
                 q2=np.full(n, 0.005, np.float32),
                 uu=np.full(n, 3.0, np.float32),
                 vv=np.full(n, 1.0, np.float32),
                 soldn=np.full(n, 600.0 * day, np.float32),
                 lwdn=np.full(n, 300.0, np.float32),
                 prcp=np.full(n, 0.0005 if 10 <= tod < 14 else 0.0,
                              np.float32))
    print(f"wrote example case for {n} points under {HERE}")


if __name__ == "__main__":
    main()
