#!/usr/bin/env python3
"""Independent transcription of EPSG Guidance Note 7-2 Oblique (double)
Stereographic (method 9809) and Lambert Azimuthal Equal Area (method
9820), used to cross-check graft.geo.AzimuthalProjections: both copies
were transcribed separately from the published formulas, so a
transcription slip in either shows up as a disagreement.

Prints forward projections for the EPSG worked examples plus a grid of
probe points, and round-trip residuals. NationalGridSpec pins the
emitted values; re-run this script if the Scala constants change.
"""
import math


def sterea_consts(a, inv_f, lat0_deg, lon0_deg):
    f = 1.0 / inv_f
    e2 = f * (2.0 - f)
    e = math.sqrt(e2)
    phi0 = math.radians(lat0_deg)
    s0 = math.sin(phi0)
    w = 1.0 - e2 * s0 * s0
    rho0 = a * (1.0 - e2) / w ** 1.5
    nu0 = a / math.sqrt(w)
    R = math.sqrt(rho0 * nu0)
    n = math.sqrt(1.0 + e2 * math.cos(phi0) ** 4 / (1.0 - e2))
    S1 = (1.0 + s0) / (1.0 - s0)
    S2 = (1.0 - e * s0) / (1.0 + e * s0)
    w1 = (S1 * S2 ** e) ** n
    sin_chi00 = (w1 - 1.0) / (w1 + 1.0)
    c = (n + s0) * (1.0 - sin_chi00) / ((n - s0) * (1.0 + sin_chi00))
    w2 = c * w1
    chi0 = math.asin((w2 - 1.0) / (w2 + 1.0))
    return dict(a=a, e=e, e2=e2, R=R, n=n, c=c, chi0=chi0,
                lam0=math.radians(lon0_deg))


def sterea_fwd(k, k0, fe, fn, lat_deg, lon_deg):
    lam = k["n"] * (math.radians(lon_deg) - k["lam0"]) + k["lam0"]
    s = math.sin(math.radians(lat_deg))
    Sa = (1.0 + s) / (1.0 - s)
    Sb = (1.0 - k["e"] * s) / (1.0 + k["e"] * s)
    w = k["c"] * (Sa * Sb ** k["e"]) ** k["n"]
    chi = math.asin((w - 1.0) / (w + 1.0))
    dl = lam - k["lam0"]
    B = (1.0 + math.sin(chi) * math.sin(k["chi0"]) +
         math.cos(chi) * math.cos(k["chi0"]) * math.cos(dl))
    E = fe + 2.0 * k["R"] * k0 * math.cos(chi) * math.sin(dl) / B
    N = fn + 2.0 * k["R"] * k0 * (math.sin(chi) * math.cos(k["chi0"]) -
        math.cos(chi) * math.sin(k["chi0"]) * math.cos(dl)) / B
    return E, N


def sterea_inv(k, k0, fe, fn, E, N):
    eP, nP = E - fe, N - fn
    rk = 2.0 * k["R"] * k0
    g = rk * math.tan(math.pi / 4 - k["chi0"] / 2)
    h = 2.0 * rk * math.tan(k["chi0"]) + g
    i = math.atan2(eP, h + nP)
    j = math.atan2(eP, g - nP) - i
    chi = k["chi0"] + 2.0 * math.atan((nP - eP * math.tan(j / 2)) / rk)
    lam = j + 2.0 * i + k["lam0"]
    lon = math.degrees((lam - k["lam0"]) / k["n"] + k["lam0"])
    psi = 0.5 * math.log((1.0 + math.sin(chi)) /
                         (k["c"] * (1.0 - math.sin(chi)))) / k["n"]
    phi = 2.0 * math.atan(math.exp(psi)) - math.pi / 2
    for _ in range(15):
        es = k["e"] * math.sin(phi)
        psi_i = math.log(math.tan(phi / 2 + math.pi / 4) *
                         ((1.0 - es) / (1.0 + es)) ** (k["e"] / 2))
        corr = (psi_i - psi) * math.cos(phi) * (1.0 - es * es) / (1.0 - k["e2"])
        phi -= corr
        if abs(corr) < 1e-15:
            break
    return math.degrees(phi), lon


def laea_consts(a, inv_f, lat0_deg, lon0_deg):
    f = 1.0 / inv_f
    e2 = f * (2.0 - f)
    e = math.sqrt(e2)

    def q_of(phi):
        s = math.sin(phi)
        return (1.0 - e2) * (s / (1.0 - e2 * s * s) -
                             (1.0 / (2.0 * e)) *
                             math.log((1.0 - e * s) / (1.0 + e * s)))

    qp = q_of(math.pi / 2)
    phi0 = math.radians(lat0_deg)
    beta0 = math.asin(q_of(phi0) / qp)
    Rq = a * math.sqrt(qp / 2.0)
    m0 = math.cos(phi0) / math.sqrt(1.0 - e2 * math.sin(phi0) ** 2)
    D = a * m0 / (Rq * math.cos(beta0))
    return dict(e=e, e2=e2, q_of=q_of, qp=qp, beta0=beta0, Rq=Rq, D=D,
                lam0=math.radians(lon0_deg))


def laea_fwd(k, fe, fn, lat_deg, lon_deg):
    lam = math.radians(lon_deg) - k["lam0"]
    beta = math.asin(k["q_of"](math.radians(lat_deg)) / k["qp"])
    B = k["Rq"] * math.sqrt(2.0 / (1.0 + math.sin(k["beta0"]) * math.sin(beta) +
        math.cos(k["beta0"]) * math.cos(beta) * math.cos(lam)))
    E = fe + B * k["D"] * math.cos(beta) * math.sin(lam)
    N = fn + (B / k["D"]) * (math.cos(k["beta0"]) * math.sin(beta) -
        math.sin(k["beta0"]) * math.cos(beta) * math.cos(lam))
    return E, N


def laea_inv(k, fe, fn, E, N):
    eP = (E - fe) / k["D"]
    nP = (N - fn) * k["D"]
    rho = math.hypot(eP, nP)
    C = 2.0 * math.asin(rho / (2.0 * k["Rq"]))
    betaP = math.asin(math.cos(C) * math.sin(k["beta0"]) +
                      nP * math.sin(C) * math.cos(k["beta0"]) / rho)
    lon = math.degrees(k["lam0"] + math.atan2(eP * math.sin(C),
        rho * math.cos(k["beta0"]) * math.cos(C) -
        nP * math.sin(k["beta0"]) * math.sin(C)))
    e2 = k["e2"]
    c1 = e2 / 3.0 + 31.0 * e2 ** 2 / 180.0 + 517.0 * e2 ** 3 / 5040.0
    c2 = 23.0 * e2 ** 2 / 360.0 + 251.0 * e2 ** 3 / 3780.0
    c3 = 761.0 * e2 ** 3 / 45360.0
    lat = math.degrees(betaP + c1 * math.sin(2 * betaP) +
                       c2 * math.sin(4 * betaP) + c3 * math.sin(6 * betaP))
    return lat, lon


def main():
    # RD New (projection only, Amersfoort-datum geodetic input)
    rd = sterea_consts(6377397.155, 299.1528128,
                       52.0 + 9.0 / 60 + 22.178 / 3600,
                       5.0 + 23.0 / 60 + 15.5 / 3600)
    k0, fe, fn = 0.9999079, 155000.0, 463000.0
    print("== 28992 sterea (native datum) ==")
    for lat, lon in [(53.0, 6.0),  # EPSG GN7-2 worked example
                     (52.0 + 9.0 / 60 + 22.178 / 3600,
                      5.0 + 23.0 / 60 + 15.5 / 3600),  # origin
                     (51.0, 4.0), (53.4, 6.9), (50.75, 5.7)]:
        E, N = sterea_fwd(rd, k0, fe, fn, lat, lon)
        rl, rn = sterea_inv(rd, k0, fe, fn, E, N)
        print(f"fwd({lat:.9f},{lon:.9f}) = E {E:.4f}  N {N:.4f}  "
              f"rt d=({rl - lat:.2e},{rn - lon:.2e})")

    la = laea_consts(6378137.0, 298.257222101, 52.0, 10.0)
    fe, fn = 4321000.0, 3210000.0
    print("== 3035 laea ==")
    for lat, lon in [(50.0, 5.0),  # EPSG GN7-2 worked example
                     (52.0, 10.0000001),  # near-origin
                     (40.0, -9.0), (60.0, 25.0), (35.0, 33.0)]:
        E, N = laea_fwd(la, fe, fn, lat, lon)
        rl, rn = laea_inv(la, fe, fn, E, N)
        print(f"fwd({lat:.7f},{lon:.7f}) = E {E:.4f}  N {N:.4f}  "
              f"rt d=({rl - lat:.2e},{rn - lon:.2e})")


if __name__ == "__main__":
    main()
