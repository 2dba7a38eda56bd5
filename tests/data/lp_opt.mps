* Bounded LP: min x1 + 2 x2
*   s.t. x1 + x2 = 1 ; x1 - x2 = 0 ; 0 <= x1, x2 <= 1
* Optimal objective 1.5 at (0.5, 0.5).
NAME          LPOPT
ROWS
 N  COST
 E  R1
 E  R2
COLUMNS
    X1        COST      1.0        R1        1.0
    X1        R2        1.0
    X2        COST      2.0        R1        1.0
    X2        R2        -1.0
RHS
    RHS1      R1        1.0        R2        0.0
BOUNDS
 UP BND1      X1        1.0
 UP BND1      X2        1.0
ENDATA
