"""Independent numpy oracles for the physics, written directly from the
reference's mathematical specification (dense, no ELL/CG machinery).  Used to
validate the JAX compute path."""

import numpy as np
from scipy.special import erfc

from devicekmc_tpu import constants as C
from devicekmc_tpu.structure import Element, site_dist

D = int(Element.DEFECT)
OD = int(Element.OXYGEN_DEFECT)
V = int(Element.VACANCY)
O = int(Element.O)


def charge_oracle(elements, neigh_idx, metal_mask_table):
    n = len(elements)
    charge = np.zeros(n, dtype=np.int64)
    for i in range(n):
        nbs = [j for j in neigh_idx[i] if j >= 0]
        if elements[i] == V:
            charge[i] = 2
            vnn = sum(1 for j in nbs if elements[j] == V)
            if vnn >= 2 or any(metal_mask_table[elements[j]] for j in nbs):
                charge[i] = 0
        elif elements[i] == OD:
            charge[i] = -2
            if any(metal_mask_table[elements[j]] for j in nbs):
                charge[i] = 0
    return charge


def laplace_oracle(
    coords, lattice, pbc, nn_dist, elements, charge, metal_table,
    high_G, low_G, n_left, n_right, v_left, v_right, rule,
):
    """Dense Dirichlet Laplace solve (reference: background_potential,
    src/potential_solver.cpp:289-410 / setLaplacePotential :4-139)."""
    n = len(coords)
    dist = site_dist(coords[:, None, :], coords[None, :, :], lattice, pbc)
    neighbor = (dist < nn_dist) & ~np.eye(n, dtype=bool)
    metal = metal_table[elements]
    if rule == "boundary":
        cvac = (elements == V) & (charge == 0)
        hi = (metal[:, None] & metal[None, :]) | (cvac[:, None] & cvac[None, :])
    else:  # "cb": either endpoint metal
        hi = metal[:, None] | metal[None, :]
    K = np.where(neighbor, np.where(hi, -high_G, -low_G), 0.0)
    np.fill_diagonal(K, 0.0)
    K[np.arange(n), np.arange(n)] = -K.sum(axis=1)

    phi = np.empty(n)
    phi[:n_left] = v_left
    phi[n - n_right:] = v_right
    interior = slice(n_left, n - n_right)
    rhs = -(
        K[interior, :n_left] @ (v_left * np.ones(n_left))
        + K[interior, n - n_right:] @ (v_right * np.ones(n_right))
    )
    phi[interior] = np.linalg.solve(K[interior, interior], rhs)
    return phi


def poisson_oracle(coords, lattice, pbc, charge, sigma, k):
    n = len(coords)
    out = np.zeros(n)
    for i in range(n):
        for j in range(n):
            if i == j or charge[j] == 0:
                continue
            r = 1e-10 * site_dist(coords[i], coords[j], lattice, pbc)
            out[i] += charge[j] * erfc(r / (sigma * np.sqrt(2))) * k * C.Q_C / r
    return out


def rate_table_oracle(
    coords, lattice, pbc, neigh_idx, elements, charge, phi, site_layer,
    layers, sigma, k, T_bg, freq,
):
    """Per-pair rates (reference: update_events_and_rates,
    src/KMCProcess.cpp:67-164)."""
    n, m = neigh_idx.shape
    P = np.zeros((n, m))
    kT = C.KB_EV * T_bg
    for i in range(n):
        for s in range(m):
            j = neigh_idx[i, s]
            if j < 0:
                continue
            r = 1e-10 * site_dist(coords[i], coords[j], lattice, pbc)

            def vsolve(q):
                return q * erfc(r / (sigma * np.sqrt(2))) * k * C.Q_C / r

            dphi = phi[i] - phi[j]
            ea = None
            if elements[i] == D and elements[j] == O:
                ea = layers[site_layer[j]].E_gen_0 - 2 * dphi
            if elements[i] == OD and elements[j] == V:
                cs = int(charge[i] - charge[j])
                E = cs * (dphi + int(cs / 2) * vsolve(2))
                ea = layers[site_layer[j]].E_rec_1 - E
            if elements[i] == V and elements[j] == O:
                si = vsolve(int(charge[i])) if charge[i] != 0 else 0.0
                E = (charge[i] - charge[j]) * (dphi + si)
                ea = layers[site_layer[i]].E_diff_2 - E
            if elements[i] == OD and elements[j] == D:
                si = vsolve(2) if charge[i] != 0 else 0.0
                E = (charge[i] - charge[j]) * (dphi - si)
                ea = layers[site_layer[j]].E_diff_3 - E
            if ea is not None:
                P[i, s] = freq * np.exp(-ea / kT)
    return P


def transmission_oracle(
    apos, lattice, pbc, aelem, acharge, acb, metal_table, p, Vd,
):
    """Dense X matrix + virtual potential solve + current + power
    (reference: updatePower CPU branch, src/current_solver.cpp:49-385).
    ``p`` is a KMCConfig.  Returns (I_macro, site-atom power, X, M)."""
    na = len(apos)
    nf = na + 2
    nsub = na + 1
    loop_G = p.high_G * 1e7
    high_G = p.high_G * 1e5
    low_G = p.low_G
    G0 = 2 * 3.8612e-5 * 1e-5
    tol = C.Q_C * 0.01
    nsi = nge = p.num_atoms_first_layer
    nlc = p.num_layers_contact

    X = np.zeros((nf, nf))
    dist = site_dist(apos[:, None, :], apos[None, :, :], lattice, pbc)
    metal = metal_table[aelem]
    prefac = -(np.sqrt(2 * p.m_e) / C.H_BAR) * (2.0 / 3.0)

    for i in range(na):
        for j in range(i + 1, na):
            neighbor = dist[i, j] < p.nn_dist
            if neighbor:
                cv1 = aelem[i] == V and acharge[i] == 0
                cv2 = aelem[j] == V and acharge[j] == 0
                g = high_G if ((metal[i] and metal[j]) or (cv1 and cv2)) else low_G
                X[i + 2, j + 2] = X[j + 2, i + 2] = -g
            else:
                vac1, vac2 = aelem[i] == V, aelem[j] == V
                m1p = metal[i] and (i > (nlc - 1) * nsi) and (i < na - (nlc - 1) * nge)
                m2p = metal[j] and (j > (nlc - 1) * nsi) and (j < na - (nlc - 1) * nge)
                t2t = vac1 and vac2
                c2t = (vac1 and m2p) or (vac2 and m1p)
                c2c = m1p and m2p
                dE = acb[i] - acb[j]
                if (t2t or c2t or c2c) and abs(dE) > tol:
                    d = 1e-10 * dist[i, j]
                    if c2t:
                        window = abs(dE)
                        dE_step = C.Q_C * 0.01
                        T = 0.0
                        iv = 0.0
                        while iv < window:
                            E1 = C.Q_C * p.V0 + iv
                            E2 = E1 - abs(dE)
                            if E2 > 0:
                                T += np.exp(prefac * (d / abs(dE)) * (E1**1.5 - E2**1.5))
                            elif E2 < 0:
                                T += np.exp(prefac * (d / abs(dE)) * E1**1.5)
                            iv += dE_step
                        X[i + 2, j + 2] = X[j + 2, i + 2] = -T
                    else:
                        E1 = C.Q_C * p.V0
                        E2 = E1 - abs(dE)
                        if E2 > 0:
                            T = np.exp(prefac * (d / abs(dE)) * (E1**1.5 - E2**1.5))
                            X[i + 2, j + 2] = X[j + 2, i + 2] = -T
                        elif E2 < 0:
                            T = np.exp(prefac * (d / abs(dE)) * E1**1.5)
                            X[i + 2, j + 2] = X[j + 2, i + 2] = -T

        if i < nsi:
            X[1, i + 2] = X[i + 2, 1] = -high_G
        if i > na - nge:
            X[0, i + 2] = X[i + 2, 0] = -high_G

    X[0, 1] = X[1, 0] = -loop_G
    for i in range(nf):
        X[i, i] = -(X[i].sum() - X[i, i])

    M = np.zeros(nf)
    M[0] = -loop_G * Vd
    M[1] = loop_G * Vd
    M[:nsub] = np.linalg.solve(X[:nsub, :nsub], M[:nsub])
    M[:nsub] *= G0

    I_macro = sum(X[0, i + 2] * (M[0] - M[i + 2]) for i in range(na))

    min_v = M[2:].min()
    Ms = M + abs(min_v)
    P_disp = np.zeros(na)
    for i in range(na):
        for j in range(na):
            if i == j:
                continue
            I_cal = X[i + 2, j + 2] * (Ms[i + 2] - Ms[j + 2])
            ineg = 0.0
            if (I_cal < 0 and Vd > 0) or (I_cal > 0 and Vd < 0):
                ineg = -I_cal
            P_disp[i] += ineg * (Ms[j + 2] - Ms[i + 2])

    atom_power = np.zeros(na)
    for i in range(nsi, na - nsi):
        alpha = 0.0 if metal[i] else 1.0
        atom_power[i] = -alpha * P_disp[i]

    return I_macro, atom_power, X, M
