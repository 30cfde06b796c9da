"""Physical constants shared across the framework.

Values mirror the reference implementation's constants so that physics output
is comparable (reference: src/input_parser.h:92-101, src/Device.h:112-117).
All energies on the KMC side are in eV; the current/tunneling solver works in
Joules (CB edges are stored in J, reference: src/potential_solver_gpu.cu:674).
"""

KB_EV = 8.617333262e-5      # Boltzmann constant [eV/K]
Q_C = 1.60217663e-19        # elementary charge [C]
H_BAR = 1.054571817e-34     # reduced Planck constant [J s]
H_BAR_SQ = 4.3957e-67       # (J s)^2
H_BAR_EV = 6.582119569e-16  # [eV s]
M_0 = 9.11e-31              # electron rest mass [kg]
EV_TO_J = 1.60217663e-19    # [J/eV] (GPU path value, potential_solver_gpu.cu:4)
COULOMB_K = 8.987552e9      # Coulomb constant [N m^2 / C^2] (before 1/epsilon)

# temperature normalisation scale for the local heat solver
# (reference: src/Device.h:117 "T_1 < background_temperature!!")
T_1 = 50.0                  # [K]
