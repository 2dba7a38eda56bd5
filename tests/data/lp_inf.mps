* Primal-infeasible LP: min x1 + x2
*   s.t. x1 + x2 = 1 ; x1 - x2 = 0 ; x2 = 1 ; x >= 0
NAME          LPINF
ROWS
 N  COST
 E  R1
 E  R2
 E  R3
COLUMNS
    X1        COST      1.0        R1        1.0
    X1        R2        1.0
    X2        COST      1.0        R1        1.0
    X2        R2        -1.0
    X2        R3        1.0
RHS
    RHS1      R1        1.0        R3        1.0
ENDATA
