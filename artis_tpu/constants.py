"""Physical constants in CGS units.

Mirrors the constants used by the reference implementation
(reference: constants.h:1-47) so that physics results are directly
comparable. All values are CGS.
"""

CLIGHT = 2.99792458e10  # speed of light [cm/s]
CLIGHT_PROP = CLIGHT  # propagation speed for rays (== CLIGHT physically)
H = 6.6260755e-27  # Planck constant [erg s]
MSUN = 1.98855e33  # solar mass [g]
LSUN = 3.826e33  # solar luminosity [erg/s]
MH = 1.67352e-24  # hydrogen atom mass [g]
ME = 9.1093897e-28  # electron mass [g]
QE = 4.80325e-10  # elementary charge [statC]
PI = 3.1415926535987
EV = 1.6021772e-12  # eV in erg
MEV = 1.6021772e-6  # MeV in erg
DAY = 86400.0  # day in seconds
SIGMA_T = 6.6524e-25  # Thomson cross-section [cm^2]
THOMSON_LIMIT = 1e-2  # h nu / m_e c^2 below which Compton -> Thomson
PARSEC = 3.0857e18  # parsec [cm]
KB = 1.38064852e-16  # Boltzmann constant [erg/K]
STEBO = 5.670400e-5  # Stefan-Boltzmann constant [erg cm^-2 s^-1 K^-4]
SAHACONST = 2.0706659e-16  # Saha constant

CLIGHTSQUARED = CLIGHT * CLIGHT
HOVERKB = H / KB
FOURPI = 4.0 * PI
ONEOVER4PI = 1.0 / FOURPI
MEC2 = ME * CLIGHTSQUARED  # electron rest energy [erg]

H_ionpot = 13.5979996 * EV

# grid geometry types
GRID_UNIFORM = 1  # cuboidal cells
GRID_SPHERICAL1D = 2  # radial shells
